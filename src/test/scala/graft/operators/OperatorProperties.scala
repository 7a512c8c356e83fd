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

  property("connected components agree with a union-find reference " +
      "on random graphs") =
    forAll(Gen.choose(2, 10), Gen.choose(1, 12),
      Gen.choose(1L, 10000L)) { (nodes, nEdges, seed) =>
      import spark.implicits._
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(nEdges)(
        (rnd.nextInt(nodes).toLong, rnd.nextInt(nodes).toLong))
      // reference: driver-side union-find with path compression
      val parent = Array.tabulate(nodes)(identity)
      def find(x: Int): Int = {
        if (parent(x) != x) parent(x) = find(parent(x)); parent(x)
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> find(v.toInt).toLong).toMap
      // expect labels = min node id of each component RESTRICTED to
      // nodes that appear in edges; union-find roots are mins because
      // unions always point the larger root at the smaller, and every
      // root here appears in some edge
      val got = Dedup.connectedComponents(
          edges.toDF("d1", "d2"), "d1", "d2")
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("comp"))
        .toMap
      got == expect
    }

  property("misra-gries (pure JVM): every item above N/(k+1) survives " +
      "any chunking and merge order, and counts never overshoot") =
    forAll(Gen.choose(1, 8), Gen.choose(1L, 10000L),
      Gen.choose(20, 400)) { (k, seed, n) =>
      val rnd = new scala.util.Random(seed)
      // zipf-ish stream over 10 words (> any k, so decrements fire)
      val stream = Seq.fill(n)("w" + (math.sqrt(
        rnd.nextInt(100 * 100)).toInt / 10))
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
      import org.apache.spark.unsafe.types.UTF8String
      // random chunking, fold chunks, merge in shuffled order
      val chunks = stream.grouped(1 + rnd.nextInt(50)).toSeq
      val partials = chunks.map { chunk =>
        val st = Sketch.MGState.empty()
        chunk.foreach(t =>
          Sketch.MGState.add(st, UTF8String.fromString(t), k))
        st
      }
      val merged = rnd.shuffle(partials)
        .reduce((a, b) => Sketch.MGState.merge(a, b, k))
      val m = Sketch.MGState.toMap(merged)
      val total = merged.n
      val threshold = n.toDouble / (k + 1)
      total == n.toLong &&
        exact.forall { case (w, c) =>
          c <= threshold || m.contains(w) } &&
        m.forall { case (w, c) => c <= exact.getOrElse(w, 0L) } &&
        m.size <= k
    }

  property("packSequences: token-conserving exact partition into " +
      "full sequences plus one ragged tail") =
    forAll(Gen.choose(1, 15), Gen.choose(2, 40),
      Gen.choose(1L, 10000L)) { (nDocs, seqLen, seed) =>
      import spark.implicits._
      val rnd = new scala.util.Random(seed)
      val docs = (1 to nDocs)
        .map(i => (i.toLong, rnd.nextInt(3 * seqLen)))
      val total = docs.map(_._2.toLong).sum
      val packed = Pack.packSequences(docs.toDF("doc_id", "n_tok"),
        "doc_id", "n_tok", seqLen, numParts = 4).collect()
      val bySeq = packed.groupBy(_.getAs[Long]("seq_id")).view
        .mapValues(_.map(r => r.getAs[Long]("tok_end") -
          r.getAs[Long]("tok_start")).sum).toMap
      val nSeqs = (total + seqLen - 1) / seqLen
      total == 0 || (
        bySeq.values.sum == total &&
        bySeq.keySet == (0L until nSeqs).toSet &&
        (0L until nSeqs - 1).forall(s => bySeq(s) == seqLen.toLong) &&
        bySeq(nSeqs - 1) == total - (nSeqs - 1) * seqLen)
    }

  property("slidingRangeSum == brute-force frame sum on random data " +
      "(dense ties stress the doubled-key boundaries)") =
    forAll(Gen.choose(1, 60), Gen.choose(1L, 40L),
      Gen.choose(1L, 10000L)) { (nRows, width, seed) =>
      import spark.implicits._
      val rnd = new scala.util.Random(seed)
      // values drawn from a SMALL domain so boundary ties (v == v',
      // v' == v - width) occur constantly
      val rows = (1 to nRows).map(i =>
        (i.toLong, if (rnd.nextBoolean()) "A" else "B",
          rnd.nextInt(60).toLong))
      val got = RangeSum.slidingRangeSum(
          rows.toDF("id", "part", "v"), "part", Seq("id"), "v",
          width, "s")
        .collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[Long]("s")).toMap
      val want = rows.map { case (id, part, v) =>
        id -> rows.filter { case (_, p2, v2) =>
          p2 == part && v2 >= v - width && v2 <= v
        }.map(_._3).sum
      }.toMap
      got == want
    }

  property("slidingRangeMinMax == brute-force frame min/max on random " +
      "data (negative values stress the block floor division)") =
    forAll(Gen.choose(1, 60), Gen.choose(1L, 40L),
      Gen.choose(1L, 10000L)) { (nRows, width, seed) =>
      import spark.implicits._
      val rnd = new scala.util.Random(seed)
      // small domain CENTERED ON ZERO: boundary ties stay constant
      // and negative values exercise pmod-corrected block assignment
      val rows = (1 to nRows).map(i =>
        (i.toLong, if (rnd.nextBoolean()) "A" else "B",
          (rnd.nextInt(60) - 30).toLong))
      val got = RangeSum.slidingRangeMinMax(
          rows.toDF("id", "part", "v"), "part", Seq("id"), "v",
          width, "mn", "mx")
        .collect()
        .map(r => r.getAs[Long]("id") ->
          (r.getAs[Long]("mn"), r.getAs[Long]("mx"))).toMap
      val want = rows.map { case (id, part, v) =>
        val frame = rows.filter { case (_, p2, v2) =>
          p2 == part && v2 >= v - width && v2 <= v
        }.map(_._3)
        id -> (frame.min, frame.max)
      }.toMap
      got == want
    }

  property("IVM refresh chain == from-scratch recompute on random " +
      "signed multisets (random retract coverage incl. zeroed groups)") =
    forAll(Gen.choose(5, 80), Gen.choose(1L, 10000L)) { (nRows, seed) =>
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val rnd = new scala.util.Random(seed)
      val base = (0 until nRows).map(i =>
        (i.toLong, s"k${rnd.nextInt(5)}", (rnd.nextInt(100) + 1) / 8.0))
      // each base row independently: survives, retracted in d1, or
      // retracted in d2 — some keys will zero out entirely
      val fate = base.map(_ => rnd.nextInt(3))
      val inserts = (0 until rnd.nextInt(10)).map(_ =>
        (s"k${rnd.nextInt(6)}", 1, (rnd.nextInt(100) + 1) / 8.0))
      val baseDf = base.map { case (_, k, v) => (k, v) }.toDF("k", "value")
      def retracts(tag: Int) = base.zip(fate).collect {
        case ((_, k, v), f) if f == tag => (k, -1, v)
      }
      val d1 = (retracts(1) ++ inserts.take(inserts.size / 2))
        .toDF("k", "op", "value")
      val d2 = (retracts(2) ++ inserts.drop(inserts.size / 2))
        .toDF("k", "op", "value")
      val inc = IVM.refresh(IVM.refresh(IVM.init(baseDf, Seq("k"),
          "value"), d1, Seq("k"), "value"), d2, Seq("k"), "value")
        .orderBy($"k").collect().toSeq
      val scratch = baseDf.withColumn("op", lit(1))
        .select($"k", $"op", $"value")
        .unionByName(d1.select($"k", $"op", $"value"))
        .unionByName(d2.select($"k", $"op", $"value"))
        .groupBy($"k")
        .agg(sum($"op".cast("long")).as("n"),
          sum(($"value" * $"op").cast("decimal(38,12)")).as("val_dec"))
        .filter($"n" > 0L).orderBy($"k").collect().toSeq
      inc == scratch
    }

  property("TopKAgg == window row_number top-K on random priorities " +
      "(duplicate priorities, many partitions)") =
    forAll(Gen.choose(1, 120), Gen.choose(1, 6), Gen.choose(1L, 10000L)) {
      (nRows, k, seed) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      import spark.implicits._
      val rnd = new scala.util.Random(seed)
      // tiny priority alphabet forces duplicate (pri) keys so the
      // (pri, id) tiebreak is load-bearing
      val rows = (0 until nRows).map(i =>
        (s"g${rnd.nextInt(4)}", s"p${rnd.nextInt(8)}", i.toLong))
      val df = rows.toDF("g", "pri", "id").repartition(7)
      val agg = df.groupBy($"g").agg(TopK.topK($"pri", $"id", k).as("t"))
        .select($"g", posexplode($"t").as(Seq("pos", "e")))
        .select($"g", ($"pos" + 1).as("rk"), $"e.pri", $"e.id")
        .orderBy($"g", $"rk").collect().toSeq
      val win = df.withColumn("rk", row_number().over(
          Window.partitionBy($"g").orderBy($"pri", $"id")))
        .filter($"rk" <= k)
        .select($"g", $"rk".cast("int"), $"pri", $"id")
        .orderBy($"g", $"rk").collect().toSeq
      agg == win
    }
}
