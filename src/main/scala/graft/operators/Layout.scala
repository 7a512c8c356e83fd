package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Table-layout management for parquet at scale: bounded file sizes,
  * value-clustered files, and small-file compaction.
  *
  * At 100 TB the two layout failure modes are (a) the small-file
  * problem — millions of KB-sized files from over-parallel or
  * incremental writes turn every scan into a metadata storm — and
  * (b) unclustered files, where every file contains every key range so
  * min/max row-group pruning never eliminates anything.
  */
object Layout {

  /** Write `df` with at most `targetRowsPerFile` rows per file,
    * optionally hive-partitioned by `partitionCols` and value-clustered
    * by `clusterCols`.
    *
    * Clustering = repartitionByRange on the cluster key, then
    * sortWithinPartitions: each output file covers a narrow key range,
    * so parquet min/max statistics prune files/row-groups for selective
    * scans — the unbucketed cousin of a bucketed layout that any
    * reader (Spark, DuckDB, Trino) benefits from with no table
    * metadata. */
  def clusteredWrite(df: DataFrame, path: String,
      targetRowsPerFile: Long,
      partitionCols: Seq[String] = Nil,
      clusterCols: Seq[String] = Nil): Unit = {
    // range-partition on (partitionCols ++ clusterCols): ranging only
    // on the cluster key would put every hive-partition value in every
    // shuffle task — numTasks × numPartitionValues files, the exact
    // explosion this module exists to prevent
    val arranged =
      if (clusterCols.nonEmpty)
        df.repartitionByRange((partitionCols ++ clusterCols).map(col): _*)
          .sortWithinPartitions(
            (partitionCols ++ clusterCols).map(col): _*)
      else if (partitionCols.nonEmpty)
        // partition-only: co-locate each hive-partition value in one
        // task, otherwise every task writes into every partition dir
        df.repartition(partitionCols.map(col): _*)
      else df
    val w = arranged.write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", targetRowsPerFile)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }

  /** Write `df` Z-order-clustered on two dimension columns: rows are
    * range-partitioned and sorted by the Morton interleave of
    * `(dimA, dimB)` (see [[graft.functions.ZOrderCols]]), so each
    * output file covers a small axis-aligned tile of the 2-D key
    * space and its parquet min/max footer stats prune box predicates
    * on EITHER or BOTH dimensions. A 1-D range-clustered layout
    * ([[clusteredWrite]]) prunes only its cluster column; the z
    * layout trades a little pruning power on dimA for pruning power
    * on dimB — the right layout when the scan workload filters on
    * two independent columns.
    *
    * Both dimension columns must be integral and non-negative
    * (< 2^31 — the morton spread masks higher bits). The helper `_z`
    * key is dropped before writing; sort order survives the
    * projection, so files still cover contiguous z ranges. */
  def zorderWrite(df: DataFrame, path: String,
      targetRowsPerFile: Long, dimA: String, dimB: String): Unit = {
    val z = graft.functions.ZOrderCols.mortonCode(col(dimA), col(dimB))
    df.withColumn("_z", z)
      .repartitionByRange(col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", targetRowsPerFile)
      .parquet(path)
  }

  /** Compact a directory of (possibly many small) parquet files into
    * ~`targetRowsPerFile`-sized files at `destPath`. Reads the source
    * once and writes a fresh directory (never in-place — readers of the
    * old path are unaffected until the swap). For a hive-partitioned
    * source pass its `partitionCols`: the rewrite preserves the
    * directory layout (one shuffle task per partition value, files
    * split by maxRecordsPerFile) instead of flattening it. */
  def compact(spark: SparkSession, srcPath: String, destPath: String,
      targetRowsPerFile: Long, partitionCols: Seq[String] = Nil): Long = {
    require(srcPath != destPath, "compaction never rewrites in place")
    val src = spark.read.parquet(srcPath)
    if (partitionCols.isEmpty) {
      val rows = src.count()
      val nFiles = math.max(1L, (rows + targetRowsPerFile - 1) /
        targetRowsPerFile).toInt
      src.repartition(nFiles).write.mode(SaveMode.Overwrite)
        .parquet(destPath)
      rows
    } else {
      // no pre-count: maxRecordsPerFile sizes files without it, so the
      // source is read exactly once; the returned count comes from the
      // written footers (metadata-only scan)
      src.repartition(partitionCols.map(col): _*)
        .write.mode(SaveMode.Overwrite)
        .option("maxRecordsPerFile", targetRowsPerFile)
        .partitionBy(partitionCols: _*)
        .parquet(destPath)
      spark.read.parquet(destPath).count()
    }
  }

  /** Layout health report: file count, total/mean/min/max file size —
    * the numbers that tell you a compaction pass is due. */
  def layoutReport(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) sizes += f.getLen
    }
    Seq((sizes.length.toLong,
      sizes.sum,
      if (sizes.isEmpty) 0L else sizes.sum / sizes.length,
      if (sizes.isEmpty) 0L else sizes.min,
      if (sizes.isEmpty) 0L else sizes.max))
      .toDF("n_files", "total_bytes", "mean_bytes", "min_bytes",
        "max_bytes")
  }
}
