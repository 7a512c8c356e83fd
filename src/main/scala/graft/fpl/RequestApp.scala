package graft.fpl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Request/response dispatch (reference ui.py:20-25 + run.sh:5):
  * a request JSON document → typed dispatch on req_type (default 3)
  * → one Catalyst plan → response JSON file.
  *
  *   req_type 1: win prediction  → predict_result.json
  *   req_type 2: player profile  → player_result.json
  *   req_type 3 (or absent): match info → match_details.json
  */
object RequestApp {

  /** Parse the request with Spark's JSON reader (single document),
    * dispatch, and return (responseFileName, responseDF). The response
    * frame is written as a single JSON document, matching the
    * reference's response files. */
  def handle(spark: SparkSession, requestJson: String,
      players: DataFrame, teams: DataFrame, chemistrySym: DataFrame,
      ratings: DataFrame, profiles: DataFrame, matches: DataFrame)
      : (String, DataFrame) = {
    import spark.implicits._
    val req = spark.read.json(Seq(requestJson).toDS())
    val reqType =
      if (req.columns.contains("req_type"))
        req.select($"req_type").as[Long].head()
      else 3L

    reqType match {
      case 1L =>
        def side(key: String): Serving.TeamRequest = {
          val row = req.select(col(s"$key.name") +:
            (1 to 11).map(i => col(s"$key.player$i")): _*).head()
          Serving.TeamRequest(row.getString(0),
            (1 to 11).map(i => row.getString(i)))
        }
        // full §2.8 model flow when the request carries a date and the
        // dims carry birthDate: fallback ratings + age model + retired
        val useModel = req.columns.contains("date") &&
          players.columns.contains("birthDate") &&
          profiles.columns.contains("matches_played")
        val result =
          if (useModel) {
            val date = req.select($"date").as[String].head()
            val hist = ratings.join(players.select($"Id".as("playerId"),
                MLCapabilities.ageAt($"birthDate", to_date(lit(date)))
                  .as("age")), Seq("playerId"))
              .select($"age", $"rating")
            Serving.winPredictionFull(spark, players, chemistrySym,
              ratings, profiles, hist, side("team1"), side("team2"),
              date) match {
              case Right(chances) => Some(chances)
              case Left(_) => None
            }
          } else Serving.winPrediction(spark, players, chemistrySym,
            ratings, side("team1"), side("team2"))
        val out = result match {
          case None => Seq(("Invalid Team", null: String, null: String))
            .toDF("status", "_1", "_2").select($"status")
          case Some(Seq(t1, t2)) =>
            Seq((t1.team, t1.winningChance, t2.team, t2.winningChance))
              .toDF("t1name", "t1chance", "t2name", "t2chance")
              .select(
                struct($"t1name".as("name"),
                  $"t1chance".as("winning chance")).as("team1"),
                struct($"t2name".as("name"),
                  $"t2chance".as("winning chance")).as("team2"))
        }
        ("predict_result.json", out)
      case 2L =>
        val name = req.select($"name").as[String].head()
        ("player_result.json", Serving.playerProfile(players, profiles, name))
      case _ =>
        val Array(date, label) =
          req.select($"date", $"label").as[(String, String)].head()
            .productIterator.map(_.toString).toArray
        val out = Serving.matchInfo(matches, players, teams, date, label)
        val res = if (out.isEmpty)
          Seq("Not Found").toDF("status")
        else out
        ("match_details.json", res)
    }
  }

  /** CLI main mirroring `spark-submit ui.py <request.json>`: reads the
    * request file and the persisted state tables from --state-dir,
    * writes the response JSON next to the request. */
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: RequestApp <request.json> <stateDir> [outDir]")
    val Array(reqPath, stateDir) = args.take(2)
    val outDir = if (args.length > 2) args(2) else "."
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val requestJson = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(reqPath)), "UTF-8")
    def t(n: String): DataFrame = spark.read.parquet(s"$stateDir/$n")
    val (fileName, out) = handle(spark, requestJson,
      t("players"), t("teams"), t("chemistry_sym"), t("ratings"),
      t("profiles"), t("matches"))
    val json = out.toJSON.collect().mkString("[", ",", "]")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/$fileName"),
      json.getBytes("UTF-8"))
    println(s"wrote $outDir/$fileName")
    spark.stop()
  }
}
