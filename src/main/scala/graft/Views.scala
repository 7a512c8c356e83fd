package graft

import org.apache.spark.sql.SparkSession

/** SQL view layer (SURVEY §4.2: join reorder / subquery decorrelation
  * come free once a SQL surface exists): registers every testdata table
  * as a temp view so `spark.sql` text queries run against them. */
object Views {
  def register(spark: SparkSession, sfDir: String): Unit =
    Tables.names.foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    }
}
