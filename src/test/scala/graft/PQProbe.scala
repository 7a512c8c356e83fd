package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Diagnostic: recall@5 of pqTopK vs brute force at a data dir for a
  * range of rerank budgets. Usage: Test/runMain graft.PQProbe <dir>. */
object PQProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.tuned(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = vecs.where(col("embedding").isNotNull).count()
    val q = vecs.filter(col("vec_id") < 50)
    val bf = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"n=$n bfPairs=${bf.size} autoRerank=${Similarity.autoRerank(n)}")
    for (rr <- (Seq(32, 64, 128, 256, 512, 1024) :+
        Similarity.autoRerank(n)).distinct.sorted) {
      val pq = Similarity.pqTopK(vecs, q, "vec_id", "embedding", 5,
        rerank = rr).collect()
      val hits = pq.count(r => bf((r.getLong(0), r.getLong(1))))
      println(f"rerank=$rr%5d recall=${hits.toDouble / bf.size}%.3f")
    }
    for (np <- Seq(2, 4, 8)) {
      val r = Similarity.ivfPqTopK(vecs, q, "vec_id", "embedding", 5,
        nprobe = np, rerank = Similarity.autoRerank(n)).collect()
      val hits = r.count(x => bf((x.getLong(0), x.getLong(1))))
      println(f"ivfpq nprobe=$np%2d rerank=auto " +
        f"recall=${hits.toDouble / bf.size}%.3f")
    }
    spark.stop()
  }
}
