package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition for dedup_embedding_lsh's decade ratio
  * (VERDICT-r8 item 2): times each pipeline stage separately at a
  * given sf dir so the 23.2×/decade number can be attributed to
  * (a) bucket computation, (b) pair GENERATION (the occ² bucket
  * self-join, pre-distinct), (c) the distinct, (d) cosine
  * verification of distinct pairs — and counts the stream at each
  * stage. Run at two dirs to decompose the decade:
  *
  *   runMain graft.LshDecomp /root/testdata/sf0.1
  *   runMain graft.LshDecomp /tmp/sf1
  */
object LshDecomp {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.VectorExprs.rpBuckets
    import graft.operators.Similarity

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val keyed = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").as("v"),
        col("label").as("blk"))
    val n = keyed.count()
    val bits = Similarity.autoBits(n)
    val buckets = keyed.select(col("id"), col("blk"),
      posexplode(rpBuckets(col("v"), 4, bits)).as(Seq("t", "bkt")))

    // warm-up: file listing + codegen
    buckets.agg(count(lit(1))).head()

    (1 to 3).foreach { round =>
      val (nb, tBuckets) = timed {
        buckets.agg(count(lit(1))).head().getLong(0)
      }
      // raw same-label pair occurrences, pre-distinct (generation cost)
      val rawPairs = buckets.as("a").join(buckets.as("b"),
          col("a.t") === col("b.t") && col("a.bkt") === col("b.bkt") &&
            col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
        .select(col("a.id").as("d1"), col("b.id").as("d2"))
      val (nRaw, tGen) = timed {
        rawPairs.agg(count(lit(1))).head().getLong(0)
      }
      val (nCand, tDistinct) = timed {
        rawPairs.distinct().agg(count(lit(1))).head().getLong(0)
      }
      val (nVer, tVerify) = timed {
        Similarity.embeddingNearDupPairsLsh(
            Tables.embeddings(spark, dir), "vec_id", "embedding",
            "label", 0.4, tables = 4, bits = bits)
          .agg(count(lit(1))).head().getLong(0)
      }
      println(s"""{"round":$round,"dir":"$dir","n":$n,"bits":$bits,""" +
        s""""n_bucket_rows":$nb,"n_raw_pairs":$nRaw,""" +
        s""""n_cand":$nCand,"n_verified":$nVer,""" +
        f""""t_buckets":$tBuckets%.3f,"t_gen":$tGen%.3f,""" +
        f""""t_distinct":$tDistinct%.3f,"t_verify_full":$tVerify%.3f}""")
    }
    spark.stop()
  }
}
