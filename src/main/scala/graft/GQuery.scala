package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query in the engine's declared surface.
  *
  * @param name   stable key, also the output dir name in Verify
  * @param fn     (session, sfDir) => result frame
  * @param oracle equivalent DuckDB SQL over the same parquet tables;
  *               None → the driver records a weaker rows-only check
  */
case class GQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object GQuery {
  /** Table-lifecycle query harness: run `body` against a fresh temp
    * dir, materialize its (bounded-by-construction) result on the
    * driver, and ALWAYS delete the dir — harnesses execute each query
    * several times (warm-up + timed rounds), so a leaked dir per
    * execution accumulates unboundedly in the temp filesystem. The
    * dir is created INSIDE the try: a failure during table SETUP
    * (base/delta/stream writes) cleans up too, not just a failure
    * during the read-back. */
  def withTempTable(s: SparkSession, prefix: String, parts: Int = 4)
      (body: String => DataFrame): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    try {
      val rows = body(dir)
      val local = rows.collect().toIndexedSeq
      s.createDataFrame(s.sparkContext.parallelize(local, parts),
        rows.schema)
    } finally {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(root).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
