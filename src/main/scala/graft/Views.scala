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
  * data. The cache records success AFTER the views exist (a failed
  * registration stays retryable) and keys the live session weakly (no
  * leak, no identity-hash reuse across sessions).
  *
  * CONTRACT — one sfDir per session at a time: temp views are
  * session-global mutable state, so concurrent callers of the SAME
  * session must use the same sfDir (registration is atomic under the
  * lock, but thread A's SQL could otherwise read thread B's data
  * mid-flight). Sequential sfDir switches are fine. Callers that need
  * concurrent access to different scale factors should isolate with
  * `spark.newSession()` — temp views are per-session, so each clone
  * gets its own namespace over the shared SparkContext. */
object Views {
  private val last = new java.util.WeakHashMap[SparkSession, String]()

  def register(spark: SparkSession, sfDir: String): Unit =
    last.synchronized {
      // cheap catalog existence probe guards against a caller having
      // dropped a temp view since the cached registration
      val intact = last.get(spark) == sfDir &&
        Tables.names.forall(spark.catalog.tableExists)
      if (!intact) {
        Tables.names.foreach { t =>
          Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
        }
        last.put(spark, sfDir)
      }
    }
}
