package graft

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of registry queries (plan-audit
  * companion to [[Prof]]: Prof times, Explain shows why).
  *
  * Usage: sbt "runMain graft.Explain [dataDir] query [query…]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tuned(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (d, names) =
      if (args.nonEmpty && args.head.startsWith("/"))
        (args.head, args.tail)
      else ("/root/testdata/sf0.1", args)
    for (name <- names) {
      println(s"== $name ==")
      Registry.queryMap(name)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
