package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: concatenate documents in a
  * deterministic order and slice the token stream into fixed-length
  * training sequences (the standard "concat-then-chunk" shape — every
  * sequence is exactly `seqLen` tokens except the ragged tail, and a
  * document may straddle a sequence boundary).
  *
  * The only global computation is the token-offset prefix sum, and the
  * naive formulation — `sum().over(Window.orderBy(id))` with no
  * partitioning — funnels the ENTIRE corpus through one task. At 100 TB
  * that is the single most common accidental scale-killer, so the
  * prefix sum here is the classic two-phase distributed scan:
  *
  *   1. range-partition by the order key and sort within partitions
  *      (parallelism = `numParts`, each task sees a contiguous key
  *      range);
  *   2. per-partition totals — `numParts` rows — are collected,
  *      cumulated on the driver, and rebroadcast as a literal
  *      `map(pid → offset)`;
  *   3. each partition adds its offset to a WITHIN-partition running
  *      sum (`Window.partitionBy(_pid)`), so no task ever holds more
  *      than its own range.
  *
  * Driver state is `numParts` longs — bounded, like the IVF centroid
  * collect (`Similarity.scala`), not data-sized.
  */
object Pack {

  /** Internal column name guaranteed absent from `cols` — same-named
    * caller columns must never be clobbered/dropped (the collision
    * class StreamOps.intervalJoin guards against). */
  private def fresh(cols: Seq[String], base: String): String =
    Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
      .find(n => !cols.contains(n)).get

  /** Adds `outCol` = EXCLUSIVE prefix sum of `valueCol` over the total
    * order of `orderCol` (i.e. sum of all strictly-preceding rows).
    * Requires distinct `orderCol` values for a well-defined total
    * order; `valueCol` must be castable to long and non-negative. */
  def withGlobalPrefixSum(df: DataFrame, orderCol: String,
      valueCol: String, outCol: String, numParts: Int = 32): DataFrame = {
    val pid = fresh(df.columns :+ outCol, "_pid")
    // localCheckpoint pins BOTH the range bounds (sampled, so not
    // stable across recomputes) and the pid column: the totals job and
    // the output job must see identical partitioning or offsets lie.
    val parts = df
      .repartitionByRange(numParts, col(orderCol))
      .sortWithinPartitions(orderCol)
      .withColumn(pid, spark_partition_id())
      .localCheckpoint()
    val totals = parts.groupBy(col(pid))
      .agg(sum(col(valueCol).cast("long")).as("t"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // exclusive per-partition offsets, in pid order
    val offsets = (0 until numParts).scanLeft(0L) {
      case (acc, p) => acc + totals.getOrElse(p, 0L)
    }
    val offsetOf = element_at(
      map((0 until numParts).flatMap(p =>
        Seq(lit(p), lit(offsets(p)))): _*),
      col(pid))
    val w = Window.partitionBy(col(pid)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parts
      .withColumn(outCol,
        sum(col(valueCol).cast("long")).over(w) -
          col(valueCol).cast("long") + offsetOf)
      .drop(pid)
  }

  /** Global 0-based rank of `orderCol` without a single-partition
    * window: a prefix sum of ones. */
  def withGlobalRank(df: DataFrame, orderCol: String, outCol: String,
      numParts: Int = 32): DataFrame = {
    val one = fresh(df.columns :+ outCol, "_one")
    withGlobalPrefixSum(df.withColumn(one, lit(1L)), orderCol,
      one, outCol, numParts).drop(one)
  }

  /** Packs documents into fixed-`seqLen` training sequences by
    * concatenation order of `idCol`. Returns one row per
    * (document × sequence it occupies): `seq_id`, doc id, `tok_start`/
    * `tok_end` (the GLOBAL token-stream half-open interval the doc
    * contributes to that sequence) and `n_tok_in_seq`. Zero-token
    * documents are dropped (they occupy no sequence). The per-doc
    * explode is bounded: a doc of n tokens spans at most
    * n/seqLen + 1 sequences. */
  def packSequences(docs: DataFrame, idCol: String, nTokCol: String,
      seqLen: Int, numParts: Int = 32): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val start = fresh(docs.columns, "_start")
    val end = fresh(docs.columns :+ start, "_end")
    val withStart = withGlobalPrefixSum(
      docs.filter(col(nTokCol) > 0), idCol, nTokCol, start, numParts)
    val L = lit(seqLen.toLong)
    withStart
      .withColumn(end, col(start) + col(nTokCol).cast("long"))
      .withColumn("seq_id",
        explode(sequence(floor(col(start) / L),
          floor((col(end) - 1) / L))))
      .select(
        col("seq_id"),
        col(idCol),
        greatest(col(start), col("seq_id") * L).as("tok_start"),
        least(col(end), (col("seq_id") + 1) * L).as("tok_end"))
      .withColumn("n_tok_in_seq", col("tok_end") - col("tok_start"))
  }

  /** Per-sequence fill report over [[packSequences]] output: document
    * count, token count, and whether the sequence is exactly full
    * (every sequence but the ragged tail must be). */
  def sequenceFill(packed: DataFrame, seqLen: Int): DataFrame =
    packed.groupBy(col("seq_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok_in_seq")).as("n_tokens"),
        min(col("tok_start")).as("tok_start"),
        max(col("tok_end")).as("tok_end"))
      .withColumn("full", col("n_tokens") === lit(seqLen.toLong))
}
