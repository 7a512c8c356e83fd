package graft

import org.apache.spark.sql.SparkSession

/** SQL view layer (SURVEY §4.2: join reorder / subquery decorrelation
  * come free once a SQL surface exists): registers every testdata table
  * as a temp view so `spark.sql` text queries run against them.
  *
  * Registration is idempotent per (session, sfDir): re-registering the
  * same directory would re-list files and re-read footers on every SQL
  * query invocation — at object-store scale that's a metadata storm.
  * Switching sfDir re-registers so views always point at the requested
  * data. */
object Views {
  private val last =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def register(spark: SparkSession, sfDir: String): Unit =
    if (last.put(System.identityHashCode(spark).toString, sfDir) != sfDir)
      Tables.names.foreach { t =>
        Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
      }
}
