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
    * engine-independent; swap in random projections for production). */
  def signBucket(vec: Column, nbits: Int = 8): Column =
    concat((0 until nbits).map(i =>
      when(element_at(vec, i + 1) > 0f, lit("1")).otherwise(lit("0"))): _*)

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

  /** IVF (inverted-file) ANN: a KMeans coarse quantizer assigns every
    * vector to its nearest of `nlist` centroids; queries score only the
    * vectors in their `nprobe` nearest cells. The scale path when
    * sign-bucket LSH recall is too coarse: centroids adapt to the data
    * distribution, and the per-query candidate set is |N|·nprobe/nlist
    * in expectation. Returns (query_id, neighbor_id, rank, cos). */
  def ivfTopK(vectors: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 2,
      seed: Long = 42L): DataFrame = {
    val spark = vectors.sparkSession
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val withVec = vectors.withColumn("__v",
      array_to_vector(col(vecCol).cast("array<double>")))
    // Quantizer training follows IVF practice: fit on a bounded sample
    // (≥256 points per cell is the usual rule of thumb) — at data scale
    // the full set is far too large to iterate on, and the centroids
    // don't improve past a few hundred points per cell. Random init with
    // a fixed seed avoids k-means||'s extra distributed passes.
    val train = withVec.limit(math.max(nlist * 256, 4096))
    // k-means|| init is kept: balanced cells are what bound the
    // per-cell join fan-out; a coarse quantizer needs few Lloyd
    // iterations beyond a good init
    val km = new KMeans().setK(nlist).setSeed(seed).setMaxIter(6)
      .setFeaturesCol("__v").setPredictionCol("__cell")
      .fit(train)
    val centroids = km.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat))
    }
    val centDf = spark.createDataFrame(centroids.toSeq)
      .toDF("cell", "centroid")
    // candidate cells per query: nprobe nearest centroids (tiny cross
    // join against nlist rows, then rank)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      fnorm(col(vecCol)).as("qn"))
    val qCells = q.crossJoin(broadcast(centDf))
      .withColumn("cdist", fdot(col("qv"), col("centroid")))
      .withColumn("crank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("cdist").desc, col("cell"))))
      .filter(col("crank") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn"), col("cell"))
    val assigned = km.transform(withVec)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        col("__cell").as("cell"), fnorm(col(vecCol)).as("cn"))
    val scored = qCells.join(assigned,
      Seq("cell")).filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", pairCos(fdot(col("qv"), col("cv")),
        col("qn"), col("cn")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
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
