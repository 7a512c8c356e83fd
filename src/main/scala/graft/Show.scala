package graft
import org.apache.spark.sql.SparkSession

/** Dev aid: print a registered query's rows at a given SF dir —
  * `runMain graft.Show <sfDir> <query...>`. Complements Prof (timing)
  * with values, for eyeballing contract booleans before the driver's
  * oracle gate runs. */
object Show {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tuned(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.head
    for (name <- args.tail) {
      println(s"=== $name @ $d")
      Registry.queryMap(name)(spark, d).show(50, truncate = false)
    }
    spark.stop()
  }
}
