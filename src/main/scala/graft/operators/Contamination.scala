package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Benchmark decontamination: flag training documents that share word
  * n-grams with a held-out evaluation set (the standard pre-training
  * hygiene check — an eval example whose n-grams appear in a training
  * doc leaks the benchmark).
  *
  * Scale posture: the asymmetric sizes are the whole design. The eval
  * set is benchmark-sized (thousands of docs) while the train side is
  * the 100 TB corpus, so the distinct eval n-gram set is broadcast and
  * the corpus is shingled ONCE, map-side, with a broadcast-hash left
  * join marking overlapping n-grams in place — no shuffle of the
  * corpus at all until the per-doc count aggregation (keyed by doc id,
  * partial-agg combines map-side). With `broadcastEval = false` the
  * join falls back to a shuffled n-gram-keyed join for eval sets too
  * big to broadcast.
  */
object Contamination {

  /** Per-train-doc overlap report vs `eval`'s k-gram set: total
    * distinct n-grams, overlapping n-grams, overlap fraction, and a
    * contaminated flag (`overlap_frac >= threshold`, so threshold 0 >
    * flags any single shared n-gram via > 0 check below). Documents
    * shorter than k tokens have zero n-grams and are never flagged. */
  def overlapReport(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, k: Int = 5, threshold: Double = 0.0,
      broadcastEval: Boolean = true): DataFrame = {
    val evalG0 = eval
      .select(explode(Dedup.shingles(col(textCol), k)).as("ng"))
      .distinct()
      .withColumn("_hit", lit(1))
    val evalG = if (broadcastEval) broadcast(evalG0) else evalG0
    // ONE shingling pass over the corpus: a left join against the eval
    // set marks overlapping n-grams in place, and a single doc-keyed
    // aggregation yields both the n-gram count and the overlap count.
    // (A semi join + separate count query would tokenize + shingle the
    // whole corpus twice.)
    val trainG = train.select(col(idCol),
      explode(array_distinct(Dedup.shingles(col(textCol), k))).as("ng"))
    val counts = trainG.join(evalG, Seq("ng"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        count(col("_hit")).as("n_overlap"))
    // docs shorter than k tokens emit no n-gram rows; re-attach them
    // with zero counts. This pass reads ONLY the id column (parquet
    // column pruning) — no tokenization happens here.
    train.select(col(idCol))
      .join(counts, Seq(idCol), "left")
      .withColumn("n_ngrams", coalesce(col("n_ngrams"), lit(0L)))
      .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
      .withColumn("overlap_frac",
        when(col("n_ngrams") > 0,
          round(col("n_overlap").cast("double") /
            col("n_ngrams").cast("double"), 6)).otherwise(lit(0.0)))
      .withColumn("contaminated",
        col("n_overlap") > 0 && col("overlap_frac") >= threshold)
  }

  /** Bloom-prefiltered variant of [[overlapReport]] for eval sets too
    * big to hash-join-broadcast: a Bloom filter over the eval n-grams
    * is a few MB at any eval cardinality (vs a broadcast hash table
    * ∝ distinct n-grams), so the corpus-side candidate test stays
    * map-side at every scale. Bloom filters have NO false negatives,
    * so bloom-surviving rows superset the true hits; the exact-verify
    * join then runs over ONLY those survivors (true hits + ~fpp of the
    * corpus n-grams), which at 100 TB shrinks the join's shuffled
    * corpus side by ~1/fpp — and makes the final report BIT-IDENTICAL
    * to the exact path, false positives corrected, which is why
    * decontaminate_bloom shares decontaminate's oracle SQL.
    *
    * Plumbing: Spark's own runtime-filter machinery
    * (`BloomFilterMightContain`, the codegen'd expression behind
    * InjectRuntimeFilter; not SQL-registered in 4.1, hence the Bridge)
    * probes with `mightContainLong`, so the filter is built over
    * `xxhash64(ng)` longs — `stat.bloomFilter` on a long column
    * inserts via `putLong`, the exact pair of the probe. The eval-side
    * `count()` sizing action is bounded by the eval set (benchmark-
    * sized by design — same class as the IVF quantizer sample). */
  def bloomReport(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, k: Int = 5, threshold: Double = 0.0,
      fpp: Double = 0.01): DataFrame = {
    val evalG = eval
      .select(explode(Dedup.shingles(col(textCol), k)).as("ng"))
      .distinct()
    val hashed = evalG.select(xxhash64(col("ng")).as("h"))
    val nEval = math.max(hashed.count(), 1L)
    val bloom = hashed.stat.bloomFilter("h", nEval, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    def mightContain(value: org.apache.spark.sql.Column) =
      Bridge.column(BloomFilterMightContain(
        Bridge.expression(lit(bytes)),
        Bridge.expression(xxhash64(value))))
    // ONE shingling pass, candidate flag computed map-side against the
    // broadcast-as-literal bloom; per-doc n-gram counts come from the
    // same pass so nothing is tokenized twice.
    val trainG = train.select(col(idCol),
        explode(array_distinct(Dedup.shingles(col(textCol), k))).as("ng"))
      .withColumn("cand", mightContain(col("ng")))
    val counts = trainG.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"))
    // exact verify over bloom survivors only — deliberately NOT a
    // broadcast hint: at scale this is a shuffled join whose corpus
    // side is already pruned to true hits + fpp noise.
    val verified = trainG.filter(col("cand"))
      .join(evalG, Seq("ng"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
    train.select(col(idCol))
      .join(counts, Seq(idCol), "left")
      .join(verified, Seq(idCol), "left")
      .withColumn("n_ngrams", coalesce(col("n_ngrams"), lit(0L)))
      .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
      .withColumn("overlap_frac",
        when(col("n_ngrams") > 0,
          round(col("n_overlap").cast("double") /
            col("n_ngrams").cast("double"), 6)).otherwise(lit(0.0)))
      .withColumn("contaminated",
        col("n_overlap") > 0 && col("overlap_frac") >= threshold)
  }
}
