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
