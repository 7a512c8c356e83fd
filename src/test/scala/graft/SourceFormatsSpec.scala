package graft

import org.apache.spark.sql.functions._

/** Source/sink format round-trips beyond parquet: ORC, CSV (header +
  * explicit schema), and JSON lines — the write side of SURVEY §2.1's
  * source rows, each read back and compared exactly. (No spark-avro
  * module ships in this Spark distribution, so Avro is out of scope.) */
class SourceFormatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val src = Tables.lineitem(spark, "/root/testdata/sf0.001")
    .limit(500).cache()

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.orderBy($"l_orderkey", $"l_linenumber")
      .collect().map(_.toSeq.map {
        case d: Double => math.round(d * 100).toString
        case ts: java.sql.Timestamp => ts.toInstant.toString
        case x => String.valueOf(x)
      })

  test("schema evolution: mergeSchema unifies old and new file schemas") {
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve")
      .toString + "/t"
    // v1 writer: two columns
    spark.range(10).select($"id", lit("a").as("c1"))
      .write.parquet(dir)
    // v2 writer adds a column — the common incremental-pipeline event
    spark.range(10, 20).select($"id", lit("b").as("c1"),
        lit(1.5).as("c2"))
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("c1", "c2", "id"))
    assert(merged.count() == 20)
    // old files surface the new column as NULL, not an error
    assert(merged.filter($"c2".isNull).count() == 10)
  }

  test("ORC round-trip preserves rows and types") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc")
    src.write.mode("overwrite").orc(dir.toString)
    val back = spark.read.orc(dir.toString)
    assert(back.schema.map(_.dataType) == src.schema.map(_.dataType))
    assert(canon(back).toSeq.map(_.toList) == canon(src).toSeq.map(_.toList))
  }

  test("CSV round-trip with header and explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv")
    src.write.mode("overwrite").option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .csv(dir.toString)
    val back = spark.read.option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .schema(src.schema).csv(dir.toString)
    assert(canon(back).toSeq.map(_.toList) == canon(src).toSeq.map(_.toList))
  }

  test("JSON-lines round-trip with explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json")
    src.write.mode("overwrite").json(dir.toString)
    val back = spark.read.schema(src.schema).json(dir.toString)
    assert(canon(back).toSeq.map(_.toList) == canon(src).toSeq.map(_.toList))
  }
}
