package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(name: String) =
    java.nio.file.Files.createTempDirectory(name).toString

  test("clusteredWrite bounds rows per file and clusters key ranges") {
    val out = tmpDir("graft-layout") + "/t"
    val df = spark.range(10000)
      .select($"id", (rand(7) * 100).cast("int").as("v"))
    Layout.clusteredWrite(df, out, targetRowsPerFile = 1000,
      clusterCols = Seq("id"))
    val report = Layout.layoutReport(spark, out).collect().head
    assert(report.getAs[Long]("n_files") >= 10,
      s"expected >=10 bounded files: $report")
    // clustering: a narrow id-range scan must prune most files via
    // parquet min/max stats — check each file's id span is narrow
    val spans = spark.read.parquet(out)
      .select(input_file_name().as("f"), $"id")
      .groupBy($"f").agg((max($"id") - min($"id")).as("span"))
      .collect().map(_.getAs[Long]("span"))
    assert(spans.forall(_ < 2000), s"unclustered file spans: ${spans.toSeq}")
    // total content preserved
    assert(spark.read.parquet(out).count() == 10000)
  }

  test("compact merges a small-file mess into few right-sized files") {
    val base = tmpDir("graft-compact")
    val src = s"$base/src"; val dest = s"$base/dest"
    // simulate incremental-append damage: 64 tiny files
    spark.range(6400).repartition(64).write.parquet(src)
    assert(Layout.layoutReport(spark, src).collect()
      .head.getAs[Long]("n_files") == 64)
    val rows = Layout.compact(spark, src, dest, targetRowsPerFile = 3200)
    assert(rows == 6400)
    val report = Layout.layoutReport(spark, dest).collect().head
    assert(report.getAs[Long]("n_files") == 2, report.toString)
    assert(spark.read.parquet(dest).count() == 6400)
  }

  test("partitioned clustered write lays out hive partitions compactly") {
    val out = tmpDir("graft-part") + "/t"
    val df = spark.range(1000).select($"id",
      (($"id" % 4).cast("int")).as("bucket"))
    Layout.clusteredWrite(df, out, targetRowsPerFile = 10000,
      partitionCols = Seq("bucket"), clusterCols = Seq("id"))
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("bucket=0", "bucket=1", "bucket=2",
      "bucket=3"), dirs.toSeq.toString)
    assert(spark.read.parquet(out).count() == 1000)
    // ranging on (partition ++ cluster) keys keeps each hive partition
    // in few shuffle tasks — not numTasks × numPartitions tiny files
    val nFiles = Layout.layoutReport(spark, out).collect()
      .head.getAs[Long]("n_files")
    assert(nFiles <= 8, s"small-file explosion: $nFiles files")
    // partition-only write co-locates too (no cluster key given)
    val out2 = tmpDir("graft-part-only") + "/t"
    Layout.clusteredWrite(df.repartition(16), out2,
      targetRowsPerFile = 10000, partitionCols = Seq("bucket"))
    val n2 = Layout.layoutReport(spark, out2).collect()
      .head.getAs[Long]("n_files")
    assert(n2 <= 4, s"partition-only write exploded: $n2 files")
  }

  test("compact preserves hive partitioning when asked") {
    val base = tmpDir("graft-compact-part")
    val src = s"$base/src"; val dest = s"$base/dest"
    spark.range(4000).select($"id", (($"id" % 2).cast("int")).as("p"))
      .repartition(32).write.partitionBy("p").parquet(src)
    val rows = Layout.compact(spark, src, dest,
      targetRowsPerFile = 2000, partitionCols = Seq("p"))
    assert(rows == 4000)
    val dirs = new java.io.File(dest).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("p=0", "p=1"), dirs.toSeq.toString)
    val nFiles = Layout.layoutReport(spark, dest).collect()
      .head.getAs[Long]("n_files")
    assert(nFiles <= 2, s"expected 1 file per partition, got $nFiles")
    assert(spark.read.parquet(dest).count() == 4000)
  }
}
