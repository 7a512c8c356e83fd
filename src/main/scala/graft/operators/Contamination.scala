package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
