package graft
import org.apache.spark.sql.SparkSession
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tuned(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    for (name <- args) {
      val fn = Registry.queryMap(name)
      for (round <- 1 to 3) {
        val t0 = System.nanoTime()
        fn(spark, d).count()
        println(f"$name round $round: ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
