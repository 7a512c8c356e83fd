package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "en"),
    (2L, "the quick brown fox jumps over the lazy cat", "en"),  // near-dup of 1
    (3L, "completely different words entirely here now", "en"),
    (4L, "the quick brown fox jumps over the lazy dog", "en"),  // exact dup of 1
    (5L, "kurz", "de"))                                          // < 3 tokens
    .toDF("doc_id", "text", "lang")

  test("shingles: 3-grams, and <k tokens yields EMPTY (sequence guard)") {
    val sh = docs.select($"doc_id",
      Dedup.shingles($"text").as("sh")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(1L).head == "the quick brown")
    assert(sh(1L).size == 7)   // 9 tokens → 7 shingles
    assert(sh(5L).isEmpty)     // 1 token → no descending-sequence blowup
  }

  test("minhash LSH finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))           // exact dup always collides
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated doc
  }

  test("ngram jaccard: identical → 1.0, near-dup high, threshold filters") {
    val j = Dedup.ngramJaccardPairs(docs, "doc_id", "text", Seq("lang"), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(j((1L, 4L)) == 1.0)
    assert(j.contains((1L, 2L)) && j((1L, 2L)) > 0.5 && j((1L, 2L)) < 1.0)
    assert(!j.contains((1L, 3L)))
  }

  test("steep 16-hash sig: first 8 slices identical to the 8-hash sig") {
    // existing oracles pin the 8-slice signature; the 16-slice
    // extension must extend it, not perturb it
    val s8 = Dedup.minhashSignatures(docs, "doc_id", "text", numHashes = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val s16 = Dedup.minhashSignatures(docs, "doc_id", "text", numHashes = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(s16.keySet == s8.keySet)
    s16.foreach { case (id, sig) =>
      assert(sig.length == 16 && sig.take(8) == s8(id))
    }
  }

  test("steep 4x4 verify: exact dup found at 1.0, unrelated docs absent") {
    val j = Dedup.verifiedNearDups(docs, "doc_id", "text", 0.8,
        numHashes = 16, bandSize = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(j((1L, 4L)) == 1.0)    // identical: all 16 mins equal → collide
    assert(!j.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("autoBits: smallest b with 2^b*128 >= n, floor 6, cap 20") {
    // values the DuckDB mirror (GREATEST(6, LENGTH(BIN((n+127)//128
    // - 1))), LEAST 20) must agree with at every SF
    assert(Similarity.autoBits(1L) == 6)
    assert(Similarity.autoBits(500L) == 6)      // sf0.01 gate: unchanged
    assert(Similarity.autoBits(2000L) == 6)     // sf0.1
    assert(Similarity.autoBits(8192L) == 6)     // exact 2^6*128 boundary
    assert(Similarity.autoBits(8193L) == 7)
    assert(Similarity.autoBits(20000L) == 8)    // sf1 tier
    assert(Similarity.autoBits(200000L) == 11)  // sf10 tier
    assert(Similarity.autoBits(1000000000L) == 20) // cap
    // minimality: 2^(b-1)*128 < n <= 2^b*128 whenever 6 < b < 20
    for (n <- Seq(8193L, 20000L, 200000L, 819200L)) {
      val b = Similarity.autoBits(n)
      assert((1L << b) * 128 >= n && (1L << (b - 1)) * 128 < n)
    }
  }

  test("simhash: identical texts → identical fingerprints; near-dups close") {
    val fp = Dedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(4L))
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fp(1L), fp(2L)) <= hamming(fp(1L), fp(3L)))
  }

  test("span dedup: first occurrence wins, survivors reassemble in order") {
    val out = Dedup.spanDedup(docs, "doc_id", "text", 3).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    def m(s: String) =
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    assert(out(1L) == ((3L, 3L,
      m("the quick brown fox jumps over the lazy dog"))))
    // doc 2 shares its first two 3-token spans with doc 1 → only the
    // differing tail survives
    assert(out(2L) == ((3L, 1L, m("the lazy cat"))))
    assert(out(3L)._2 == 2L)                  // unique doc keeps all
    assert(out(4L) == ((3L, 0L, m(""))))      // exact dup loses everything
    assert(out(5L) == ((1L, 1L, m("kurz")))) // short tail span survives
  }

  test("exact dedup collapses duplicate keys") {
    val d = Dedup.exactDedup(docs, Seq("text"), "doc_id")
      .filter($"n_duplicates" > 1).collect()
    assert(d.length == 1 && d.head.getAs[Long]("representative_id") == 1L)
  }

  private val vecs = Seq(
    (1L, Array(1f, 0f, 0f), 0),
    (2L, Array(0f, 1f, 0f), 0),
    (3L, Array(2f, 0f, 0f), 0),     // same direction as 1
    (4L, Array(-1f, 0f, 0f), 1))
    .toDF("vec_id", "embedding", "label")

  test("cosine: colinear=1, orthogonal=0, opposite=-1") {
    val c = vecs.as("a").crossJoin(vecs.as("b"))
      .select($"a.vec_id".as("i"), $"b.vec_id".as("j"),
        Similarity.cosine($"a.embedding", $"b.embedding").as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(approx(c((1L, 3L)), 1.0))
    assert(approx(c((1L, 2L)), 0.0))
    assert(approx(c((1L, 4L)), -1.0))
  }

  test("FloatDot is bit-identical to the declarative HOF spelling") {
    val vecs64 = (1 to 20).map { i =>
      (i.toLong, Array.tabulate(64)(j =>
        (math.sin(i * 64 + j) * 3).toFloat))
    }.toDF("vec_id", "embedding")
    val pairs = vecs64.as("a").crossJoin(vecs64.as("b"))
    val native = pairs.select(
      graft.functions.VectorExprs.fdot($"a.embedding", $"b.embedding")
        .as("d")).as[Double].collect()
    val hof = pairs.select(
      aggregate(zip_with($"a.embedding", $"b.embedding",
        (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("d")).as[Double].collect()
    assert(native.length == hof.length)
    native.zip(hof).foreach { case (n, h) =>
      assert(n == h, s"bitwise mismatch: $n vs $h") // exact, not approx
    }
  }

  test("RpBuckets matches a pure-Scala reference and is codegen-stable") {
    // vec 31 is all rounding ties: ±odd/16 × 1000 = exact ±.5 halfway
    // points, where half-up and half-away-from-zero disagree — pins the
    // floor(x·1000 + 0.5) tie rule shared with the DuckDB oracle
    val vecs64 = ((1 to 30).map { i =>
      (i.toLong, Array.tabulate(64)(j =>
        (math.sin(i * 64 + j) * 3).toFloat))
    } :+ (31L, Array.tabulate(64)(j =>
      (if (j % 2 == 0) 1 else -1) * (2 * j + 1) / 16.0f)))
      .toDF("vec_id", "embedding")
    val got = vecs64.select($"vec_id",
      graft.functions.VectorExprs.rpBuckets($"embedding", 4, 6).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    def ref(v: Array[Float]): Seq[Int] = {
      val q = v.map(x => math.floor(x * 1000.0 + 0.5).toLong)
      (0 until 4).map { t =>
        (0 until 6).map { j =>
          val dot = q.indices.map(k =>
            q(k) * (((7 * j + 13 * k + 29 * t) % 17) - 8)).sum
          if (dot > 0) 1 << j else 0
        }.sum
      }
    }
    (1 to 30).foreach { i =>
      val v = Array.tabulate(64)(j => (math.sin(i * 64 + j) * 3).toFloat)
      assert(got(i.toLong) == ref(v), s"vec $i")
    }
    val ties = Array.tabulate(64)(j =>
      (if (j % 2 == 0) 1 else -1) * (2 * j + 1) / 16.0f)
    assert(got(31L) == ref(ties), "tie-valued vector")
    // nearby vectors share buckets; far ones (mostly) don't
    val a = Array.tabulate(64)(j => math.sin(j).toFloat)
    val near = a.clone(); near(0) = (near(0) + 0.001).toFloat
    val far = a.map(-_)
    val trio = Seq((1L, a), (2L, near), (3L, far))
      .toDF("vec_id", "embedding")
      .select($"vec_id",
        graft.functions.VectorExprs.rpBuckets($"embedding", 4, 6).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(trio(1L) == trio(2L), "epsilon-perturbed vector changed buckets")
    assert(trio(1L).zip(trio(3L)).forall { case (x, y) => x != y },
      "negated vector kept a bucket (signs should all flip)")
  }

  test("LSH near-dup pairs are a verified subset of label-blocked pairs") {
    val base = Array.tabulate(64)(j => math.sin(j).toFloat)
    val nearDup = base.map(x => (x * 1.001f))
    val other = Array.tabulate(64)(j => math.cos(3 * j + 1).toFloat)
    val df = Seq(
      (1L, base, 0), (2L, nearDup, 0), (3L, other, 0),
      (4L, base.map(-_), 1))
      .toDF("vec_id", "embedding", "label")
    val lsh = Similarity.embeddingNearDupPairsLsh(df, "vec_id",
      "embedding", "label", 0.9).collect()
    val full = Similarity.embeddingNearDupPairs(df, "vec_id",
      "embedding", "label", 0.9).collect()
    // the colinear near-dup pair survives LSH; nothing else qualifies
    assert(lsh.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L)))
    assert(full.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L)))
    // candidate pairs never cross labels
    val keyed = df.select($"vec_id".as("id"), $"embedding".as("v"),
      $"label".as("blk"))
    val cand = Similarity.lshCandidatePairs(keyed, 4, 6).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(!cand.contains((1L, 4L)) && !cand.contains((2L, 4L)))
  }

  test("brute-force top-k ranks by cosine desc with id tie-break") {
    val topk = Similarity.bruteForceTopK(vecs,
      vecs.filter($"vec_id" === 1), "vec_id", "embedding", 2).collect()
    assert(topk.length == 2)
    assert(topk.head.getAs[Long]("neighbor_id") == 3L) // cos 1.0 first
  }

  test("bucketed top-k only pairs same-sign-bucket vectors") {
    val bt = Similarity.bucketedTopK(vecs, vecs, "vec_id", "embedding",
      5, nbits = 3).collect()
    val pairs = bt.map(r => (r.getAs[Long]("query_id"),
      r.getAs[Long]("neighbor_id"))).toSet
    assert(pairs.contains((1L, 3L)) && pairs.contains((3L, 1L)))
    assert(!pairs.exists { case (q, n) => Set(q, n) == Set(1L, 4L) })
  }

  test("connected components: chains merge, islands stay apart") {
    // component {1..5} as a CHAIN (diameter 4 — forces multi-round
    // propagation, not just one-hop), component {10,11} as an edge,
    // and 20-20 self-loop (a doc paired with itself upstream would be
    // a bug, but the operator must not corrupt on it)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L),
      (20L, 20L)).toDF("d1", "d2")
    val cc = Dedup.connectedComponents(edges, "d1", "d2").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("comp")).toMap
    assert((1L to 5L).forall(cc(_) == 1L), cc.toString)
    assert(cc(10L) == 10L && cc(11L) == 10L)
    assert(cc(20L) == 20L)
    assert(cc.size == 8)
    // maxIter smaller than the diameter must still terminate (capped),
    // and full run must be deterministic
    val capped = Dedup.connectedComponents(edges, "d1", "d2", maxIter = 1)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("comp"))
      .toMap
    assert(capped(2L) == 1L) // one round: direct-neighbor min
    val again = Dedup.connectedComponents(edges, "d1", "d2").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("comp")).toMap
    assert(again == cc)
  }

  test("random-projection LSH recovers neighbors the axis-aligned " +
      "family loses on anisotropic embeddings") {
    // adversarial-for-signBucket data: the leading 8 dims are ±0.01
    // noise (exactly what signBucket hashes), the trailing 8 carry two
    // tight clusters. Axis-aligned buckets split true neighbors on
    // noise bits; seeded random projections see the cluster dims.
    val rnd = new scala.util.Random(11)
    val vecs = (1L to 40L).map { i =>
      val cluster = if (i % 2 == 0) 1f else -1f
      val noise = Array.fill(8)((rnd.nextGaussian() * 0.01).toFloat)
      val signal = Array.fill(8)(cluster + (rnd.nextGaussian() * 0.05).toFloat)
      (i, noise ++ signal, 0)
    }.toDF("vec_id", "embedding", "label")
    val queries = vecs.filter($"vec_id" <= 10)
    def hits(df: org.apache.spark.sql.DataFrame): Long = {
      val brute = Similarity.bruteForceTopK(vecs, queries,
        "vec_id", "embedding", 3)
      df.join(brute, Seq("query_id", "neighbor_id"), "inner").count()
    }
    val axisHits = hits(Similarity.bucketedTopK(vecs, queries,
      "vec_id", "embedding", 3, nbits = 8))
    val rpHits = hits(Similarity.rpLshTopK(vecs, queries,
      "vec_id", "embedding", 3, dim = 16, nbits = 4, tables = 8))
    // rp-LSH must recover ≥90% of the exact top-3 and strictly beat
    // the axis-aligned family on this geometry
    assert(rpHits >= 27, s"rp-LSH recall too low: $rpHits/30")
    assert(rpHits > axisHits,
      s"random projections ($rpHits) should beat axis-aligned ($axisHits)")
    // determinism: same seed ⇒ same buckets ⇒ same result set
    val again = hits(Similarity.rpLshTopK(vecs, queries,
      "vec_id", "embedding", 3, dim = 16, nbits = 4, tables = 8))
    assert(again == rpHits)
  }

  test("IVF top-k: full probe equals brute force; partial probe ⊆ candidates") {
    val rnd = new scala.util.Random(7)
    val vecs = (1L to 60L).map(i =>
      (i, Array.fill(8)(rnd.nextGaussian().toFloat), 0))
      .toDF("vec_id", "embedding", "label")
    val queries = vecs.filter($"vec_id" <= 5)
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        r.getAs[Long]("neighbor_id")).toMap
    val brute = asMap(Similarity.bruteForceTopK(vecs, queries,
      "vec_id", "embedding", 3))
    val fullProbe = asMap(Similarity.ivfTopK(vecs, queries,
      "vec_id", "embedding", 3, nlist = 4, nprobe = 4))
    assert(fullProbe == brute) // probing every cell = exact search
    val partial = Similarity.ivfTopK(vecs, queries, "vec_id",
      "embedding", 3, nlist = 4, nprobe = 1).collect()
    assert(partial.nonEmpty)
    partial.foreach(r => assert(r.getAs[Int]("rank") <= 3))
  }

  test("scrubPii replaces emails, IPs, phones; leaves clean text alone") {
    val rows = Seq(
      (1L, "mail me at jane.doe+x@corp.example.org today"),
      (2L, "server 192.168.10.7 responded"),
      (3L, "call 555-867-5309 now"),
      (4L, "no pii here, just 3.14 and v1.2.3")).toDF("id", "t")
    val out = rows.select($"id", TextAnalysis.scrubPii($"t").as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "mail me at <EMAIL> today")
    assert(out(2L) == "server <IP> responded")
    assert(out(3L) == "call <PHONE> now")
    assert(out(4L) == "no pii here, just 3.14 and v1.2.3")
  }

  test("localLloyd: deterministic, k centroids, finite, separates modes") {
    val rnd = new scala.util.Random(11)
    def cluster(center: Float, n: Int) =
      Array.fill(n)(Array.fill(4)(center + rnd.nextGaussian().toFloat * 0.1f))
    val pts = cluster(0f, 50) ++ cluster(10f, 50) ++ cluster(-10f, 50)
    val c1 = Similarity.localLloyd(pts, 3, 8, seed = 42L)
    val c2 = Similarity.localLloyd(pts, 3, 8, seed = 42L)
    assert(c1.length == 3)
    assert(c1.flatten.forall(f => !f.isNaN && !f.isInfinite))
    // deterministic for a fixed seed
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    // three well-separated modes → one centroid near each
    val means = c1.map(_.sum / 4)
    assert(Set(-10f, 0f, 10f).forall(m =>
      means.exists(c => math.abs(c - m) < 2)), means.toSeq.toString)
    // k > n degrades gracefully to n centroids
    assert(Similarity.localLloyd(pts.take(2), 5, 3, 1L).length == 2)
    // null vectors excluded end-to-end: a null embedding never surfaces
    val withNull = Seq((100L, null: Array[Float], 0))
      .toDF("vec_id", "embedding", "label")
    val vecs = (1L to 20L).map(i =>
      (i, Array.fill(4)(rnd.nextGaussian().toFloat), 0))
      .toDF("vec_id", "embedding", "label").unionByName(withNull)
    val out = Similarity.ivfTopK(vecs, vecs.filter($"vec_id" <= 3),
      "vec_id", "embedding", 5, nlist = 2, nprobe = 2).collect()
    assert(out.nonEmpty)
    assert(!out.exists(r => r.getAs[Long]("neighbor_id") == 100L ||
      r.isNullAt(r.fieldIndex("cos"))))
  }

  test("text analysis: quality ∈ [0,1], langid deterministic, rolling hash order-sensitive") {
    val q = docs.select(TextAnalysis.qualityScore($"text").as("q"))
      .as[Double].collect()
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
    val lp = Seq((1L, "der hund und die katze ist da"),
      (2L, "the cat and the dog is here"))
      .toDF("doc_id", "text")
      .select($"doc_id", TextAnalysis.predictLang($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(lp(1L) == "de" && lp(2L) == "en")
    val rh = TextAnalysis.rollingHash(
      Seq((1L, "a b c"), (2L, "c b a"), (3L, "a b c")).toDF("doc_id", "text"),
      "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rolling_hash"))
      .toMap
    assert(rh(1L) == rh(3L) && rh(1L) != rh(2L))
  }
}
