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

  /** Distinct k-shingles of a text column via the native single-pass
    * kernel (`graft.functions.ShingleSet` — also the MinHash tokenizer).
    * Replaces the declarative `array_distinct(Dedup.shingles(...))`
    * spelling: that one nests `split` inside an interpreted
    * higher-order `transform`, where no CSE applies and the text is
    * re-split per produced element — measured at ~6× the whole
    * honestly-materialized report cost at sf0.1 (docs/PERF.md §bench
    * protocol, round 6). Identical output: same first-occurrence
    * distinct order, empty for <k tokens, null text drops at explode. */
  private def docShingleSet(text: org.apache.spark.sql.Column, k: Int) =
    graft.functions.HashExprs.shingleSet(split(text, " "), k)

  /** Per-train-doc overlap report vs `eval`'s k-gram set: total
    * distinct n-grams, overlapping n-grams, overlap fraction, and a
    * contaminated flag (`overlap_frac >= threshold`, so threshold 0 >
    * flags any single shared n-gram via > 0 check below). Documents
    * shorter than k tokens have zero n-grams and are never flagged. */
  def overlapReport(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, k: Int = 5, threshold: Double = 0.0,
      broadcastEval: Boolean = true): DataFrame = {
    val evalG0 = eval
      .select(explode(docShingleSet(col(textCol), k)).as("ng"))
      .distinct()
      .withColumn("_hit", lit(1))
    val evalG = if (broadcastEval) broadcast(evalG0) else evalG0
    // ONE shingling pass over the corpus: a left join against the eval
    // set marks overlapping n-grams in place, and a single doc-keyed
    // aggregation yields both the n-gram count and the overlap count.
    // (A semi join + separate count query would tokenize + shingle the
    // whole corpus twice.)
    val trainG = train.select(col(idCol),
      explode(docShingleSet(col(textCol), k)).as("ng"))
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

  /** The candidate probe: Spark's native codegen'd runtime-filter
    * expression over a serialized `util.sketch.BloomFilter` built from
    * `xxhash64` longs — `putLong` on the build side is the exact pair
    * of `mightContainLong` on the probe side. Public so the no-UDF
    * plan property is testable on its own (bloomReport checkpoints the
    * probe stage, hiding it from the final frame's plan). */
  def bloomProbe(bloomBytes: Array[Byte],
      value: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    Bridge.column(BloomFilterMightContain(
      Bridge.expression(lit(bloomBytes)),
      Bridge.expression(xxhash64(value))))

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
    // lineage cut: the eval shingle set feeds THREE consumers — the
    // sizing count, the bloomFilter build, and the exact-verify join —
    // each a separate action/plan that would otherwise re-tokenize and
    // re-distinct the whole eval set (same cut as perDoc below)
    val evalG = eval
      .select(explode(docShingleSet(col(textCol), k)).as("ng"))
      .distinct()
      .localCheckpoint()
    val hashed = evalG.select(xxhash64(col("ng")).as("h"))
    val nEval = math.max(hashed.count(), 1L)
    val bloom = hashed.stat.bloomFilter("h", nEval, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    def mightContain(value: org.apache.spark.sql.Column) =
      bloomProbe(bytes, value)
    // ONE shingling pass over the corpus: a single per-doc aggregation
    // yields both the n-gram count and the bloom-surviving n-gram list
    // (collect_list skips the nulls `when` leaves for non-candidates;
    // survivors are true hits + ~fpp of the doc's n-grams, so the array
    // is small by construction). The doc-level frame is localCheckpoint'd
    // — the same lineage cut text_tfidf uses — because BOTH the verify
    // branch and the final report consume it, and without the cut each
    // consumer would re-run the corpus shingle pass.
    val perDoc = train.select(col(idCol),
        explode(docShingleSet(col(textCol), k)).as("ng"))
      .withColumn("cand", mightContain(col("ng")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        collect_list(when(col("cand"), col("ng"))).as("cands"))
      .localCheckpoint()
    // exact verify over bloom survivors only — deliberately NOT a
    // broadcast hint: at scale this is a shuffled join whose corpus
    // side is already pruned to true hits + fpp noise.
    val verified = perDoc
      .select(col(idCol), explode(col("cands")).as("ng"))
      .join(evalG, Seq("ng"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
    train.select(col(idCol))
      .join(perDoc.select(col(idCol), col("n_ngrams")), Seq(idCol), "left")
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
