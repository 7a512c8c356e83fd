package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Brute-force cosine top-k is the correctness baseline; the scale path
  * is bucketed search (random-hyperplane-style sign-bit LSH buckets, or
  * any coarse quantizer): queries only score candidates in their own
  * bucket, turning the N×M cross join into per-bucket joins. Both are
  * pure column algebra — the dot product is a sequential
  * `aggregate(zip_with(...))` fold (deterministic association order).
  */
object Similarity {

  import graft.functions.VectorExprs.{fdot, fnorm}

  /** Cosine similarity between two float-array columns — codegen'd
    * double-precision sequential fold (graft.functions.FloatDot). */
  def cosine(a: Column, b: Column): Column =
    fdot(a, b) / (fnorm(a) * fnorm(b))

  /** Per-pair cosine from pre-computed norms: at N×M pair scale this is
    * one dot per pair instead of three. */
  private def pairCos(dot: Column, n1: Column, n2: Column): Column =
    round(dot / (n1 * n2), 6)

  /** Brute-force top-k neighbors for the query rows (excluding self).
    * Norms are computed once per vector, not per pair. Output:
    * (query_id, neighbor_id, rank, cos) with cosine rounded for
    * cross-engine rank stability. */
  def bruteForceTopK(vectors: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      fnorm(col(vecCol)).as("qn"))
    val c = vectors.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      fnorm(col(vecCol)).as("cn"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", pairCos(fdot(col("qv"), col("cv")),
        col("qn"), col("cn")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** Sign-bit LSH bucket over the first `nbits` dimensions (a fixed
    * axis-aligned hyperplane family — deterministic and
    * engine-independent, so a SQL oracle can replicate it; recall
    * collapses on embeddings whose variance concentrates away from the
    * leading axes — use [[randomProjectionBucket]] in production). */
  def signBucket(vec: Column, nbits: Int = 8): Column =
    concat((0 until nbits).map(i =>
      when(element_at(vec, i + 1) > 0f, lit("1")).otherwise(lit("0"))): _*)

  /** Seeded random hyperplanes for sign-LSH: `nbits` unit-normalized
    * Gaussian directions over `dim` dimensions. Deterministic in
    * (dim, nbits, seed), generated driver-side and embedded as plan
    * literals — no state, no fit step, broadcast-free. */
  private[operators] def randomHyperplanes(dim: Int, nbits: Int,
      seed: Long): Array[Array[Float]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nbits) {
      val h = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(h.map(x => x * x).sum)
      h.map(x => (x / n).toFloat)
    }
  }

  /** Production sign-LSH bucket: bit i = sign(vec · hᵢ) for a seeded
    * random-projection family. Rotation-free-lunch vs [[signBucket]]:
    * random directions spread bucket entropy across ALL dimensions, so
    * recall holds on correlated/anisotropic embeddings where the
    * axis-aligned family degenerates into one mega-bucket (e.g. an
    * all-positive leading dimension hashing every vector identically).
    * Same codegen'd FloatDot kernel as the scoring path. */
  def randomProjectionBucket(vec: Column, dim: Int, nbits: Int = 8,
      seed: Long = 42L): Column =
    concat(randomHyperplanes(dim, nbits, seed).map(h =>
      when(fdot(vec, typedlit(h)) > 0d, lit("1")).otherwise(lit("0")))
      .toIndexedSeq: _*)

  /** Bucketed ANN top-k: queries only score same-bucket candidates.
    * Recall < 1 by construction; the candidate set per query is |bucket|
    * instead of N. */
  def bucketedTopK(vectors: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nbits: Int = 8): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      signBucket(col(vecCol), nbits).as("qb"),
      fnorm(col(vecCol)).as("qn"))
    val c = vectors.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"), signBucket(col(vecCol), nbits).as("cb"),
      fnorm(col(vecCol)).as("cn"))
    val scored = q.join(c,
      col("qb") === col("cb") && col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", pairCos(fdot(col("qv"), col("cv")),
        col("qn"), col("cn")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("qb").as("bucket"), col("neighbor_id"),
        col("rank"), col("cos"))
  }

  /** Multi-table random-projection LSH top-k: `tables` independent
    * seeded hyperplane families of `nbits` bits each
    * (OR-amplification). Queries score the UNION of their same-bucket
    * candidates across tables, so candidate work per query is
    * Σ_t |bucket_t| and recall follows 1−(1−p^nbits)^tables for
    * per-bit agreement p = 1−θ/π — tunable to any target without
    * scoring the whole corpus. This is the production bucketed-ANN
    * shape for correlated/anisotropic embeddings, where the
    * axis-aligned [[signBucket]] family degenerates (near-constant
    * leading dimensions hash everything together, or noisy ones split
    * true neighbors).
    *
    * Plan shape: bucket bits are plan literals (seeded driver-side
    * generation, no fit step); each side explodes to (vector, bucket)
    * rows; the join key is the bucket string; the pair-dedup groupBy
    * and the top-k window shuffle only candidate pairs. */
  def rpLshTopK(vectors: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int, nbits: Int = 4, tables: Int = 8,
      seed: Long = 42L): DataFrame = {
    def buckets(vec: Column): Column =
      array((0 until tables).map { t =>
        val planes = randomHyperplanes(dim, nbits, seed + t)
        concat(lit(s"$t:") +: planes.toIndexedSeq.map(h =>
          when(fdot(vec, typedlit(h)) > 0d, lit("1"))
            .otherwise(lit("0"))): _*)
      }: _*)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      fnorm(col(vecCol)).as("qn"), explode(buckets(col(vecCol))).as("bk"))
    val c = vectors.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"), fnorm(col(vecCol)).as("cn"),
      explode(buckets(col(vecCol))).as("bk"))
    // a pair colliding in several tables must score once, not L times
    val pairs = q.join(c, Seq("bk"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("cv"),
        col("qn"), col("cn"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = pairs.withColumn("cos", pairCos(fdot(col("qv"), col("cv")),
      col("qn"), col("cn")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** Driver-side Lloyd's with k-means++ seeding over a bounded sample.
    * Quantizer training is O(sample·k·iters·dim) — microscopic next to
    * one distributed pass over the data — so it runs where it's free
    * (the driver) instead of as a fleet of tiny cluster jobs. */
  private[operators] def localLloyd(points: Array[Array[Float]], k: Int,
      iters: Int, seed: Long): Array[Array[Float]] = {
    val n = points.length
    require(n > 0, "ivfTopK: empty training sample")
    val dim = points(0).length
    val rnd = new scala.util.Random(seed)
    def dist2(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var j = 0
      while (j < dim) { val t = a(j) - b(j); d += t * t; j += 1 }
      d
    }
    // k-means++ (D²) seeding: balanced cells bound the per-cell join
    // fan-out, and good seeds need few Lloyd iterations to converge
    val kk = math.min(k, n)
    val cents = scala.collection.mutable.ArrayBuffer(
      points(rnd.nextInt(n)).clone)
    val minD = Array.fill(n)(Double.MaxValue)
    while (cents.length < kk) {
      var i = 0
      var total = 0.0
      while (i < n) {
        val d = dist2(points(i), cents.last)
        if (d < minD(i)) minD(i) = d
        total += minD(i); i += 1
      }
      var r = rnd.nextDouble() * total
      var pick = 0
      i = 0
      while (i < n - 1 && r > 0) { r -= minD(i); if (r > 0) pick = i + 1; i += 1 }
      cents += points(pick).clone
    }
    var centArr = cents.toArray
    for (_ <- 0 until iters) {
      val sums = Array.fill(centArr.length)(new Array[Double](dim))
      val counts = new Array[Long](centArr.length)
      var i = 0
      while (i < n) {
        val p = points(i)
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < centArr.length) {
          val d = dist2(p, centArr(c))
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        val s = sums(best); var j = 0
        while (j < dim) { s(j) += p(j); j += 1 }
        counts(best) += 1
        i += 1
      }
      centArr = Array.tabulate(centArr.length) { c =>
        if (counts(c) == 0) centArr(c)
        else Array.tabulate(dim)(j => (sums(c)(j) / counts(c)).toFloat)
      }
    }
    centArr
  }

  /** IVF (inverted-file) ANN: a coarse quantizer assigns every vector to
    * its nearest of `nlist` centroids; queries score only the vectors in
    * their `nprobe` nearest cells. The scale path when sign-bucket LSH
    * recall is too coarse: centroids adapt to the data distribution, and
    * the per-query candidate set is |N|·nprobe/nlist in expectation.
    *
    * Scale shape (FAISS-style): quantizer trained on a bounded sample
    * (≥256 points/cell) locally on the driver; centroids broadcast as a
    * literal; cell assignment is a pure map-side projection (argmin-L2
    * via `array_max` over the centroid array — no shuffle, no ML jobs);
    * the probe side is broadcast into the candidate join so the big
    * vector table never shuffles. Returns (query_id, neighbor_id, rank,
    * cos). */
  def ivfTopK(vectors: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 2,
      seed: Long = 42L, broadcastProbes: Boolean = true): DataFrame = {
    // Training sample: top-n by content hash — a deterministic
    // pseudo-random draw that is distribution-representative even when
    // the table is clustered by id/time (a bare limit() would read one
    // corner of the data). TakeOrdered keeps a 4096-row heap per
    // partition: one pass, no full sort. Null vectors are dirty data,
    // not trainable points.
    val sample = vectors.select(col(vecCol))
      .where(col(vecCol).isNotNull)
      .orderBy(xxhash64(col(vecCol)))
      .limit(math.max(nlist * 256, 4096))
      .collect().map(_.getSeq[Float](0).toArray)
    val cents = localLloyd(sample, nlist, iters = 8, seed = seed)
    // centroid literal: array<struct<cell:int, cv:array<float>, n2:double>>
    // where n2 = |c|²; nearest-by-L2 == argmax(2·v·c − |c|²), so struct
    // comparison on (score, cell) picks the nearest cell deterministically
    val centArr = array(cents.zipWithIndex.map { case (cv, i) =>
      struct(lit(i).as("cell"), typedlit(cv).as("cv"),
        lit(cv.foldLeft(0.0)((a, x) => a + x.toDouble * x)).as("n2"))
    }: _*)
    def cellScores(vec: Column): Column = transform(centArr, c =>
      struct((fdot(vec, c.getField("cv")) * lit(2.0) - c.getField("n2"))
        .as("score"), c.getField("cell").as("cell")))
    // null vectors are excluded from search entirely: left in, their
    // null scores would tie-break into the last cell and surface as
    // null-cos neighbors in under-full cells
    val assigned = vectors.where(col(vecCol).isNotNull)
      .select(col(idCol).as("neighbor_id"),
        col(vecCol).as("cv"), fnorm(col(vecCol)).as("cn"),
        array_max(cellScores(col(vecCol))).getField("cell").as("cell"))
    // nprobe nearest cells per query — map-side sort of the 16-element
    // score array, then explode; no window, no shuffle
    val qCells = queries.where(col(vecCol).isNotNull)
      .select(col(idCol).as("query_id"),
        col(vecCol).as("qv"), fnorm(col(vecCol)).as("qn"),
        explode(slice(reverse(array_sort(cellScores(col(vecCol)))), 1,
          nprobe).getField("cell")).as("cell"))
    // An ANN probe set is normally dimension-sized → broadcast it so
    // the vector table never shuffles. For all-pairs / bulk-inference
    // shapes (queries ≈ corpus) pass broadcastProbes=false and the
    // planner joins on the cell key instead of collecting the probe
    // side to every executor.
    val probes = if (broadcastProbes) broadcast(qCells) else qCells
    val scored = probes.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", pairCos(fdot(col("qv"), col("cv")),
        col("qn"), col("cn")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** Product-quantization ANN (ADC scan + exact rerank): each vector
    * compresses to `m` sub-codes by quantizing its m dim/m-wide
    * subspaces against per-subspace `ksub`-entry codebooks, trained
    * like the IVF coarse quantizer — bounded hash-ordered driver
    * sample, seeded Lloyd per subspace, fully deterministic. A query
    * scans ALL codes in the compressed domain: approximate dot =
    * Σ_j LUT_j[code_j] — m table lookups per pair instead of a
    * dim-wide float dot, with the per-query LUT (m × ksub sub-dots)
    * built once, map-side. The best `rerank` candidates per query are
    * then re-scored exactly against the true vectors.
    *
    * Scale shape: a code row is m small ints + one stored norm vs
    * 4·dim bytes of floats (32× at dim 64, m 8) — the scan's working
    * set fits executor memory at corpus sizes where raw vectors
    * cannot. The code table never shuffles: queries (with their LUTs)
    * broadcast into the scan, and the Q·rerank candidate set
    * broadcasts into the rerank join against the vector table. The
    * ADC scan only SELECTS — ranking among survivors is exact — so
    * with rerank ≥ N the result equals brute force exactly
    * (hash-gated by sim_pq_fullrerank; quality at bounded rerank is
    * gated by sim_pq_topk's recall contract). Returns (query_id,
    * neighbor_id, rank, cos). */
  def pqTopK(vectors: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 8, ksub: Int = 16,
      rerank: Int = 32, seed: Long = 42L): DataFrame = {
    val sample = vectors.select(col(vecCol))
      .where(col(vecCol).isNotNull)
      .orderBy(xxhash64(col(vecCol)))
      .limit(math.max(ksub * 256, 4096))
      .collect().map(_.getSeq[Float](0).toArray)
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    // independent per-subspace codebooks; the seed offset decorrelates
    // subspace quantizers trained on the same sample
    val books = Array.tabulate(m)(j =>
      localLloyd(sample.map(_.slice(j * dsub, (j + 1) * dsub)),
        ksub, iters = 8, seed = seed + j))
    def sub(vec: Column, j: Int): Column = slice(vec, j * dsub + 1, dsub)
    // per-subspace code: argmin-L2 == argmax(2·v·c − |c|²); struct
    // comparison tie-breaks on code id like the IVF cell assignment
    def codeOf(vec: Column, j: Int): Column = {
      val entries = array(books(j).zipWithIndex.map { case (cv, i) =>
        struct(lit(i).as("c"), typedlit(cv).as("cv"),
          lit(cv.foldLeft(0.0)((a, x) => a + x.toDouble * x)).as("n2"))
      }: _*)
      array_max(transform(entries, e =>
        struct((fdot(sub(vec, j), e.getField("cv")) * lit(2.0) -
          e.getField("n2")).as("score"), e.getField("c").as("c"))))
        .getField("c")
    }
    val codes = array((0 until m).map(codeOf(col(vecCol), _)): _*)
    // codebook norms as one nested literal: vn2 ≈ |v|² reconstructs
    // from the codes alone, stored beside them like the codes
    val n2Lit = typedlit(books.map(_.map(cv =>
      cv.foldLeft(0.0)((a, x) => a + x.toDouble * x)).toSeq).toSeq)
    val enc = vectors.where(col(vecCol).isNotNull).select(
      col(idCol).as("neighbor_id"), codes.as("pq_codes"),
      aggregate(transform(codes, (c, j) =>
        element_at(element_at(n2Lit, (j + lit(1)).cast("int")),
          (c + lit(1)).cast("int"))),
        lit(0.0), (acc, x) => acc + x).as("vn2"))
    val bookLits = (0 until m).map(j =>
      typedlit(books(j).map(_.toSeq).toSeq))
    val q = queries.where(col(vecCol).isNotNull).select(
      col(idCol).as("query_id"), col(vecCol).as("qv"),
      fnorm(col(vecCol)).as("qn"),
      array((0 until m).map(j => transform(bookLits(j),
        cv => fdot(sub(col(vecCol), j), cv))): _*).as("lut"))
    // the compressed-domain linear scan: m lookups per (query, code)
    val scanned = enc.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", aggregate(
        transform(col("pq_codes"), (c, j) =>
          element_at(element_at(col("lut"), (j + lit(1)).cast("int")),
            (c + lit(1)).cast("int"))),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("approx_cos",
        col("adc") / (col("qn") * sqrt(col("vn2"))))
    val wSel = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("approx_cos").desc, col("neighbor_id"))
    // candidates carry only the id pair (16 bytes/row) so a large
    // adaptive rerank budget still broadcasts; query vectors rejoin
    // from the (dimension-sized) query side, also broadcast
    val cand = scanned.withColumn("sel", row_number().over(wSel))
      .filter(col("sel") <= rerank)
      .select(col("query_id"), col("neighbor_id"))
    val exact = broadcast(cand).join(
        vectors.where(col(vecCol).isNotNull).select(
          col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
          fnorm(col(vecCol)).as("cn")),
        Seq("neighbor_id"))
      .join(broadcast(q.select(col("query_id"), col("qv"), col("qn"))),
        Seq("query_id"))
      .withColumn("cos",
        pairCos(fdot(col("qv"), col("cv")), col("qn"), col("cn")))
    val wK = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    exact.withColumn("rank", row_number().over(wK))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** IVF-PQ: the production composition of the two ANN halves — the
    * coarse quantizer restricts WHICH codes a query scans (nprobe of
    * nlist cells ⇒ ~N·nprobe/nlist candidates instead of N), and
    * product quantization compresses WHAT is scanned (m sub-codes +
    * a norm instead of 4·dim bytes). Training shares one bounded
    * hash-ordered driver sample: coarse centroids via seeded Lloyd,
    * per-subspace codebooks via seeded Lloyd with offset seeds.
    * Cell assignment, PQ encoding, cell probing and LUT construction
    * are all map-side against broadcast literals; candidate scoring
    * joins on the cell key with the (dimension-sized) probe side
    * broadcast, so the code table never shuffles; the exact rerank
    * re-scores the ADC survivors against true vectors, id-pair
    * candidates broadcast as in [[pqTopK]].
    *
    * Recall composes multiplicatively: cell probing bounds it above
    * by the IVF tier (sim_ivf_recall's 60% at nprobe=4), ADC
    * selection within the probed cells retains ~0.9 of that at the
    * [[autoRerank]] budget — gated end to end by sim_ivfpq_recall.
    * Returns (query_id, neighbor_id, rank, cos). */
  def ivfPqTopK(vectors: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
      m: Int = 8, ksub: Int = 16, rerank: Int = 32,
      seed: Long = 42L): DataFrame = {
    val sample = vectors.select(col(vecCol))
      .where(col(vecCol).isNotNull)
      .orderBy(xxhash64(col(vecCol)))
      .limit(math.max(math.max(nlist, ksub) * 256, 4096))
      .collect().map(_.getSeq[Float](0).toArray)
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    val coarse = localLloyd(sample, nlist, iters = 8, seed = seed)
    val books = Array.tabulate(m)(j =>
      localLloyd(sample.map(_.slice(j * dsub, (j + 1) * dsub)),
        ksub, iters = 8, seed = seed + 1 + j))
    // coarse assignment (same argmax(2·v·c − |c|²) form as ivfTopK)
    val centArr = array(coarse.zipWithIndex.map { case (cv, i) =>
      struct(lit(i).as("cell"), typedlit(cv).as("cv"),
        lit(cv.foldLeft(0.0)((a, x) => a + x.toDouble * x)).as("n2"))
    }: _*)
    def cellScores(vec: Column): Column = transform(centArr, c =>
      struct((fdot(vec, c.getField("cv")) * lit(2.0) - c.getField("n2"))
        .as("score"), c.getField("cell").as("cell")))
    def sub(vec: Column, j: Int): Column = slice(vec, j * dsub + 1, dsub)
    def codeOf(vec: Column, j: Int): Column = {
      val entries = array(books(j).zipWithIndex.map { case (cv, i) =>
        struct(lit(i).as("c"), typedlit(cv).as("cv"),
          lit(cv.foldLeft(0.0)((a, x) => a + x.toDouble * x)).as("n2"))
      }: _*)
      array_max(transform(entries, e =>
        struct((fdot(sub(vec, j), e.getField("cv")) * lit(2.0) -
          e.getField("n2")).as("score"), e.getField("c").as("c"))))
        .getField("c")
    }
    val codes = array((0 until m).map(codeOf(col(vecCol), _)): _*)
    val n2Lit = typedlit(books.map(_.map(cv =>
      cv.foldLeft(0.0)((a, x) => a + x.toDouble * x)).toSeq).toSeq)
    val enc = vectors.where(col(vecCol).isNotNull).select(
      col(idCol).as("neighbor_id"),
      array_max(cellScores(col(vecCol))).getField("cell").as("cell"),
      codes.as("pq_codes"),
      aggregate(transform(codes, (c, j) =>
        element_at(element_at(n2Lit, (j + lit(1)).cast("int")),
          (c + lit(1)).cast("int"))),
        lit(0.0), (acc, x) => acc + x).as("vn2"))
    val bookLits = (0 until m).map(j =>
      typedlit(books(j).map(_.toSeq).toSeq))
    // one row per (query, probed cell), LUT computed once per query
    // then carried into its nprobe rows
    val q = queries.where(col(vecCol).isNotNull).select(
      col(idCol).as("query_id"), col(vecCol).as("qv"),
      fnorm(col(vecCol)).as("qn"),
      array((0 until m).map(j => transform(bookLits(j),
        cv => fdot(sub(col(vecCol), j), cv))): _*).as("lut"),
      explode(slice(reverse(array_sort(cellScores(col(vecCol)))), 1,
        nprobe).getField("cell")).as("cell"))
    val scanned = enc.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", aggregate(
        transform(col("pq_codes"), (c, j) =>
          element_at(element_at(col("lut"), (j + lit(1)).cast("int")),
            (c + lit(1)).cast("int"))),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("approx_cos",
        col("adc") / (col("qn") * sqrt(col("vn2"))))
    val wSel = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("approx_cos").desc, col("neighbor_id"))
    val cand = scanned.withColumn("sel", row_number().over(wSel))
      .filter(col("sel") <= rerank)
      .select(col("query_id"), col("neighbor_id"))
    val exact = broadcast(cand).join(
        vectors.where(col(vecCol).isNotNull).select(
          col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
          fnorm(col(vecCol)).as("cn")),
        Seq("neighbor_id"))
      .join(broadcast(queries.where(col(vecCol).isNotNull).select(
          col(idCol).as("query_id"), col(vecCol).as("qv"),
          fnorm(col(vecCol)).as("qn"))),
        Seq("query_id"))
      .withColumn("cos",
        pairCos(fdot(col("qv"), col("cv")), col("qn"), col("cn")))
    val wK = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    exact.withColumn("rank", row_number().over(wK))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** Rerank budget for [[pqTopK]] as the corpus grows: a FIXED budget
    * selects a shrinking fraction of the corpus, so ADC rank noise —
    * whose absolute magnitude grows with N — pushes true neighbors
    * out of the candidate set and recall decays (measured at the
    * 22k-vector sf1 tier: rerank 32 → 15.6% recall@5, 256 → 52%,
    * 512 → 66%, 1024 → 80%). A corpus FRACTION of 1/16 (floor 32)
    * measures ≥0.64 recall@5 on every tier probed (0.64 at n=500,
    * ~0.69 at 2k, ~0.85 at 22k — PQProbe reproduces the curve),
    * comfortably over the oracle's 50% bar, while the rerank join
    * stays Q·N/16 id-pairs — still microscopic next to the N·Q scan.
    * Same defect-and-fix shape as [[autoBits]]: a fixed knob that
    * must scale with the corpus, made adaptive and deterministic. */
  def autoRerank(n: Long): Int =
    math.max(32L, n / 16L).min(Int.MaxValue.toLong).toInt

  /** Hash width for sign-LSH bucketing: the smallest b with
    * 2^b · 128 ≥ n (floor 6, cap 20) — expected bucket occupancy stays
    * ≤ ~128 as the corpus grows, so within-bucket pair generation stays
    * near-linear instead of quadratic (a FIXED bits means occupancy
    * ∝ N and pair work ∝ N²: measured as a >30 GB spill crash at the
    * sf10 tier before bits went adaptive). Integer-exact bit-length
    * arithmetic, no float log2 — DuckDB mirrors it as
    * GREATEST(6, LENGTH(BIN(c-1))) over the same count, and a 1-ulp
    * log disagreement at an exact power-of-two boundary would flip the
    * bucket layout of the whole corpus. */
  def autoBits(n: Long): Int = {
    val c = (n + 127L) / 128L
    val b = if (c <= 1L) 0
      else 64 - java.lang.Long.numberOfLeadingZeros(c - 1L)
    math.min(math.max(6, b), 20)
  }

  /** Embedding near-duplicate pairs with LSH blocking — the 100 TB
    * variant of [[embeddingNearDupPairs]]. Blocking by a FIXED-
    * cardinality column (label) makes block sizes grow ∝ N and pair
    * work ∝ N²; here candidates must also share a sign-LSH bucket in
    * at least one of `tables` hash tables (integer-exact
    * [[graft.functions.RpBuckets]], so an external SQL engine
    * reproduces the bucketing bit-for-bit). Expected bucket occupancy
    * is N/2^bits per table — `bits < 0` (the default) derives it from
    * a corpus count via [[autoBits]], keeping pair work near-linear at
    * any SF. OR-amplification over `tables` tables recovers the
    * recall a single table loses. Candidates are deduped BEFORE
    * scoring (a pair colliding in several tables is scored once), and
    * vectors are re-attached by key afterwards so the wide embedding
    * column never rides through the multi-table explode. */
  def embeddingNearDupPairsLsh(vectors: DataFrame, idCol: String,
      vecCol: String, blockCol: String, threshold: Double,
      tables: Int = 4, bits: Int = -1): DataFrame = {
    val keyed = vectors.select(col(idCol).as("id"),
      col(vecCol).as("v"), col(blockCol).as("blk"))
    val b = if (bits < 0) autoBits(keyed.count()) else bits
    verifyCandidatesCosine(lshCandidatePairs(keyed, tables, b), keyed,
      threshold)
  }

  /** Cosine verification of an already-derived candidate pair set
    * (d1 < d2): two id-keyed joins to the vector table, one fused
    * dot+norm expression per DISTINCT pair, threshold filter. Split
    * out (r9) so callers that need BOTH the candidate count and the
    * verified count — dedup_embedding_lsh's gate shape — can
    * materialize the candidate set once and feed it to both branches
    * instead of re-running the bucket self-join + distinct per
    * branch (a join+distinct chain defeats exchange reuse). */
  def verifyCandidatesCosine(cand: DataFrame, keyed: DataFrame,
      threshold: Double): DataFrame = {
    val kn = keyed.select(col("id"), col("v"), fnorm(col("v")).as("nrm"))
    cand.select(col("d1"), col("d2"))
      .join(kn.select(col("id").as("d1"), col("v").as("v1"),
        col("nrm").as("n1")), Seq("d1"))
      .join(kn.select(col("id").as("d2"), col("v").as("v2"),
        col("nrm").as("n2")), Seq("d2"))
      .withColumn("cos", pairCos(fdot(col("v1"), col("v2")),
        col("n1"), col("n2")))
      .filter(col("cos") >= threshold)
      .select(col("d1"), col("d2"), col("cos"))
  }

  /** Distinct same-block multi-table LSH candidate pairs (d1 < d2) for
    * a frame keyed as (id, v, blk). A pair colliding in several tables
    * appears once. */
  def lshCandidatePairs(keyed: DataFrame, tables: Int, bits: Int)
      : DataFrame = {
    import graft.functions.VectorExprs.rpBuckets
    val buckets = keyed
      .select(col("id"), col("blk"),
        posexplode(rpBuckets(col("v"), tables, bits)).as(Seq("t", "bkt")))
    buckets.as("a")
      .join(buckets.as("b"),
        col("a.t") === col("b.t") && col("a.bkt") === col("b.bkt") &&
          col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("d1"), col("b.id").as("d2"))
      .distinct()
  }

  /** Embedding near-duplicate pairs: same-block cosine ≥ threshold. */
  def embeddingNearDupPairs(vectors: DataFrame, idCol: String,
      vecCol: String, blockCol: String, threshold: Double): DataFrame = {
    val a = vectors.select(col(idCol).as("d1"), col(vecCol).as("v1"),
      col(blockCol).as("b1"), fnorm(col(vecCol)).as("n1"))
    val b = vectors.select(col(idCol).as("d2"), col(vecCol).as("v2"),
      col(blockCol).as("b2"), fnorm(col(vecCol)).as("n2"))
    a.join(b, col("b1") === col("b2") && col("d1") < col("d2"))
      .withColumn("cos", pairCos(fdot(col("v1"), col("v2")),
        col("n1"), col("n2")))
      .filter(col("cos") >= threshold)
      .select(col("d1"), col("d2"), col("cos"))
  }
}
