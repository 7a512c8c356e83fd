package graft.streaming

import graft.SparkSpec
import graft.fpl.Fixture
import org.apache.spark.sql.streaming.Trigger

/** The source seam (SURVEY §2.1 S1): socket is the reference's dev
  * transport, file/Kafka the prod mappings. The file path is driven
  * end-to-end through the full stateful pipeline here; Kafka cannot run
  * in this sandbox (no broker, no connector jar), so its wiring is
  * validated at the option level. */
class LineSourceSpec extends SparkSpec {
  import spark.implicits._

  test("file source drives the full pipeline to match closes") {
    val in = java.nio.file.Files.createTempDirectory("graft-linesrc")
    // the fixture match + events, then the same squad's next match
    // record (bumped id) so match 1001 closes for every event player
    val replay = Fixture.allLines :+
      Fixture.matchJson.replace("\"wyId\":1001", "\"wyId\":1002")
    java.nio.file.Files.write(in.resolve("replay.jsonl"),
      replay.mkString("\n").getBytes)
    val lines = LineSource(spark,
      Map("source" -> "file", "path" -> in.toString))
    assert(lines.isStreaming && lines.columns.sameElements(Array("value")))
    val q = FplStream.matchCloses(FplStream.toMessages(lines))
      .writeStream.format("memory").queryName("linesrc_closes")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-linesrc-cp").toString)
      .outputMode("append")
      .start()
    q.awaitTermination(60000)
    val closes = spark.table("linesrc_closes")
      .select("playerId", "matchId").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every event-producing fixture player closes match 1001
    assert(closes == Set(1L, 2L, 3L, 4L, 11L, 12L, 13L).map(_ -> 1001L),
      closes.toString)
  }

  test("socket config keeps the reference's transport shape") {
    // construction only — no listener needed until the query starts
    val df = LineSource(spark,
      Map("source" -> "socket", "host" -> "localhost", "port" -> "9"))
    assert(df.isStreaming && df.columns.sameElements(Array("value")))
  }

  test("missing required options and unknown sources fail fast") {
    val e1 = intercept[IllegalArgumentException] {
      LineSource(spark, Map("source" -> "kafka"))
    }
    assert(e1.getMessage.contains("kafka.bootstrap.servers"))
    val e2 = intercept[IllegalArgumentException] {
      LineSource(spark, Map("source" -> "file"))
    }
    assert(e2.getMessage.contains("path"))
    val e3 = intercept[IllegalArgumentException] {
      LineSource(spark, Map("source" -> "pigeon"))
    }
    assert(e3.getMessage.contains("pigeon"))
  }
}
