package graft.streaming

import graft.SparkSpec
import graft.fpl.{Fixture, Ingest}
import org.apache.spark.sql.streaming.Trigger

/** Fault-tolerance and robustness of the streaming pipeline. */
class RecoverySpec extends SparkSpec {
  import spark.implicits._

  test("stop/restart from checkpoint: no lost or duplicated closes") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-rec")
    val inDir = tmp.resolve("in"); java.nio.file.Files.createDirectory(inDir)
    val out = tmp.resolve("state").toString
    val ckpt = tmp.resolve("ckpt").toString
    def sentinel(id: Long) = Fixture.matchJson
      .replace("\"wyId\":1001", s""""wyId":$id""")

    // phase 1: match 1001 only (no punctuation yet → zero closes)
    java.nio.file.Files.write(inDir.resolve("a.jsonl"),
      String.join("\n", Fixture.allLines: _*).getBytes)
    val q1 = FplStream.run(spark.readStream.text(inDir.toString), out, ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination()

    // phase 2: NEW query from the same checkpoint; punctuation arrives
    java.nio.file.Files.write(inDir.resolve("b.jsonl"),
      sentinel(9999L).getBytes)
    val q2 = FplStream.run(spark.readStream.text(inDir.toString), out, ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()

    val closes = spark.read.parquet(out)
    // exactly the 7 event-producing players of match 1001, exactly once
    assert(closes.count() == 7, closes.collect().mkString("\n"))
    assert(closes.select("playerId").distinct().count() == 7)
    // state survived the restart: ratings reflect match-1001 events
    val p1 = closes.filter($"playerId" === 1).collect().head
    assert(approx(p1.getAs[Double]("rating"), 0.3609375))
  }

  test("malformed lines parse to corrupt rows and are excluded cleanly") {
    val lines = (Fixture.allLines :+ "{not json at all" :+ "" :+
      """{"unknownField": 1}""").toDF("value")
    val parsed = Ingest.parse(lines)
    assert(Ingest.matches(parsed).count() == 1)
    assert(Ingest.events(parsed).count() == Fixture.eventJsons.size)
    // the junk rows exist in the parsed frame but carry neither key
    assert(parsed.count() == Fixture.allLines.size + 3)
  }
}
