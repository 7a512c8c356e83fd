package graft.fpl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Season-scale throughput benchmark for the football pipeline.
  *
  * The reference processes one EPL season (380 matches, ~1700 events
  * each ⇒ ~650k events) through a 100-second bounded DStream run with
  * per-record Python lambdas (reference master.py:379). This main
  * synthesizes a deterministic season of the same shape, runs the full
  * batch pipeline (metrics → minutes → ratings → chemistry → profiles)
  * and the streaming path (file source, AvailableNow), and prints
  * events/sec for each. Usage:
  *   sbt "runMain graft.fpl.SeasonBench [nMatches] [eventsPerMatch]"
  */
object SeasonBench {

  def synthSeason(nMatches: Int, eventsPerMatch: Int): Seq[String] = {
    val rnd = new scala.util.Random(42)
    (1 to nMatches).flatMap { m =>
      val home = 100 + (m % 20)
      val away = 100 + ((m + 7) % 20)
      def squad(t: Int) = (0 until 14).map(i => t * 100 + i)
      val lineup = (t: Int) => squad(t).take(11).map(p =>
        s"""{"playerId":$p,"goals":"0","ownGoals":"0","yellowCards":"0","redCards":"0"}""")
        .mkString("[", ",", "]")
      val bench = (t: Int) => squad(t).drop(11).map(p =>
        s"""{"playerId":$p,"goals":"0","ownGoals":"0","yellowCards":"0","redCards":"0"}""")
        .mkString("[", ",", "]")
      val matchJson =
        s"""{"wyId":$m,"dateutc":"2018-01-01 12:00:00","duration":"Regular",
           |"gameweek":${(m - 1) / 10 + 1},"label":"M$m","status":"Played",
           |"venue":"V","winner":$home,"teamsData":{
           |"$home":{"hasFormation":1,"score":1,"side":"home","teamId":$home,
           | "formation":{"lineup":${lineup(home)},"bench":${bench(home)},
           |  "substitutions":[{"playerIn":${home * 100 + 11},"playerOut":${home * 100},"minute":60}]}},
           |"$away":{"hasFormation":1,"score":0,"side":"away","teamId":$away,
           | "formation":{"lineup":${lineup(away)},"bench":${bench(away)},
           |  "substitutions":[]}}}}""".stripMargin.replaceAll("\n", "")
      val events = (1 to eventsPerMatch).map { e =>
        val t = if (rnd.nextBoolean()) home else away
        val p = t * 100 + rnd.nextInt(11)
        val eventId = Seq(1, 2, 3, 8, 8, 8, 10)(rnd.nextInt(7))
        val tags = eventId match {
          case 8 => if (rnd.nextBoolean()) "[{\"id\":1801}]" else "[{\"id\":1802}]"
          case 1 => s"""[{"id":${Seq(701, 702, 703)(rnd.nextInt(3))}}]"""
          case 10 => if (rnd.nextInt(10) == 0) "[{\"id\":1801},{\"id\":101}]"
            else "[{\"id\":1801}]"
          case _ => "[]"
        }
        s"""{"id":${m * 100000 + e},"eventId":$eventId,"subEventId":0,
           |"matchId":$m,"matchPeriod":"1H","eventSec":$e.0,
           |"playerId":$p,"teamId":$t,"tags":$tags}"""
          .stripMargin.replaceAll("\n", "")
      }
      matchJson +: events
    }
  }

  def main(args: Array[String]): Unit = {
    val nMatches = if (args.nonEmpty) args(0).toInt else 380
    val eventsPerMatch = if (args.length > 1) args(1).toInt else 1700
    val spark = graft.GraftSession.tuned(SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val season = synthSeason(nMatches, eventsPerMatch)
    val nEvents = nMatches.toLong * eventsPerMatch
    val tmp = java.nio.file.Files.createTempDirectory("graft-season")
    val inDir = tmp.resolve("in"); java.nio.file.Files.createDirectory(inDir)
    val inFile = inDir.resolve("season.jsonl")
    java.nio.file.Files.write(inFile, season.mkString("\n").getBytes)

    // batch
    var t0 = System.nanoTime()
    val lines = spark.read.text(inFile.toString)
    val parsed = Ingest.parse(lines)
    val events = Ingest.events(parsed).cache()
    val matches = Ingest.matches(parsed).cache()
    val fm = MetricsAlgebra.playerMatchMetrics(events).cache()
    val pm = Flatten.playerMinutes(matches)
    val ratings = Folds.ratings(spark, fm, pm).cache()
    val nRatings = ratings.count()
    val chem = Chemistry.chemistryTable(
      ratings.select($"matchId", $"playerId", $"teamId", $"delta"))
    val nChem = chem.count()
    val nProfiles = Folds.profiles(fm).count()
    val batchSec = (System.nanoTime() - t0) / 1e9

    // streaming replay, flatMapGroupsWithState path (file source,
    // AvailableNow, parquet sink — the production shape)
    t0 = System.nanoTime()
    val q = graft.streaming.FplStream.run(
        spark.readStream.text(inDir.toString),
        tmp.resolve("out").toString, tmp.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamSec = (System.nanoTime() - t0) / 1e9
    val nCloses = spark.read.parquet(tmp.resolve("out").toString).count()

    // streaming replay, transformWithState path (RocksDB state store;
    // same fold kernel, noop sink so only source+state cost is timed)
    t0 = System.nanoTime()
    val qt = graft.streaming.FplStreamTWS.matchCloses(
        graft.streaming.FplStream.toMessages(
          spark.readStream.text(inDir.toString)))
      .writeStream.format("noop")
      .option("checkpointLocation", tmp.resolve("ckpt-tws").toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    qt.awaitTermination()
    val twsSec = (System.nanoTime() - t0) / 1e9

    println(f"""{"matches":$nMatches,"events":$nEvents,""" +
      f""""batch_sec":$batchSec%.2f,"batch_events_per_sec":${nEvents / batchSec}%.0f,""" +
      f""""stream_sec":$streamSec%.2f,"stream_events_per_sec":${nEvents / streamSec}%.0f,""" +
      f""""tws_sec":$twsSec%.2f,"tws_events_per_sec":${nEvents / twsSec}%.0f,""" +
      f""""ratings":$nRatings,"chem_pairs":$nChem,"profiles":$nProfiles,"closes":$nCloses}""")
    spark.stop()
  }
}
