package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based invariants for the training-pipeline kernels:
  * Jaccard bounds/symmetry, MinHash identity/length, quantizer shape,
  * PII-scrub idempotence. Spark-backed properties run a reduced case
  * count; pure-JVM ones (localLloyd) run more. */
object OperatorProperties extends Properties("operators") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.TestSpark.spark

  private val genWord: Gen[String] =
    Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val genText: Gen[String] =
    Gen.choose(3, 25).flatMap(n =>
      Gen.listOfN(n, genWord).map(_.mkString(" ")))

  property("jaccard: self-similarity 1, symmetric, bounded") =
    forAll(genText, genText) { (t1, t2) =>
      import spark.implicits._
      val df = Seq((1L, t1), (2L, t2), (3L, t1))
        .toDF("doc_id", "text").withColumn("blk",
          org.apache.spark.sql.functions.lit(1))
      val pairs = Dedup.ngramJaccardPairs(df, "doc_id", "text",
          Seq("blk"), threshold = 0.0, shingleK = 2)
        .collect()
        .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")) ->
          r.getAs[Double]("jaccard")).toMap
      val bounded = pairs.values.forall(j => j >= 0.0 && j <= 1.0)
      // docs 1 and 3 are identical: if either has >=2 tokens their
      // similarity is exactly 1
      val selfOk = !pairs.contains((1L, 3L)) || pairs((1L, 3L)) == 1.0
      bounded && selfOk
    }

  property("minhash: identical texts → identical signatures of length n") =
    forAll(genText) { t =>
      import spark.implicits._
      val df = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
      val sigs = Dedup.minhashSignatures(df, "doc_id", "text",
          numHashes = 8, shingleK = 2)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getSeq[String](r.fieldIndex("sig")).toList)
      sigs.isEmpty || // too short to shingle — filtered, fine
        (sigs.forall(_._2.length == 8) &&
          sigs.map(_._2).distinct.length == 1)
    }

  property("localLloyd: ≤k finite centroids of input dimension") =
    forAll(Gen.choose(1, 40), Gen.choose(1, 6),
      Gen.choose(1L, 1000L)) { (n, k, seed) =>
      val rnd = new scala.util.Random(seed)
      val pts = Array.fill(n)(Array.fill(3)(rnd.nextGaussian().toFloat))
      val c = Similarity.localLloyd(pts, k, iters = 4, seed = seed)
      c.length == math.min(k, n) &&
        c.forall(v => v.length == 3 &&
          v.forall(f => !f.isNaN && !f.isInfinite))
    }

  property("scrubPii is idempotent") =
    forAll(genText) { t =>
      import spark.implicits._
      val df = Seq((t + " a@b.co 10.1.2.3 555-123-4567"))
        .toDF("t")
      val once = df.select(TextAnalysis.scrubPii($"t").as("c"))
      val twice = once.select(TextAnalysis.scrubPii($"c").as("c"))
      once.head.getString(0) == twice.head.getString(0)
    }
}
