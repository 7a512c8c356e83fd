package graft
import org.apache.spark.sql.SparkSession
object Prof {
  def main(args: Array[String]): Unit = {
    // r15: honor SPARK_GRAFT_CPUS so per-query isolation can run at
    // the bench-protocol core count (default stays 32 — the historical
    // Prof setting every prior round's warm numbers were taken at).
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // optional leading arg: a data dir (e.g. /tmp/sf1) instead of sf0.1
    val (d, names) =
      if (args.nonEmpty && args.head.startsWith("/"))
        (args.head, args.tail)
      else ("/root/testdata/sf0.1", args)
    for (name <- names) {
      val fn = Registry.queryMap(name)
      for (round <- 1 to 3) {
        val t0 = System.nanoTime()
        Registry.force(fn(spark, d)) // full materialization, not count()
        println(f"$name round $round: ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
