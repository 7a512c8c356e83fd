package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Frequency sketches for vocabulary-scale corpora.
  *
  * The naive "top tokens" query — explode → groupBy(token) → count →
  * top-k — shuffles one row per DISTINCT token. At 100 TB the token
  * vocabulary is billions of strings, most of which occur once; the
  * shuffle is dominated by junk that can never be frequent. The
  * Misra–Gries summary bounds the state to k counters PER PARTIAL
  * BUFFER: each executor folds its partition into ≤k counters map-side
  * and only those sketches are merged (mergeable-summaries semantics,
  * Agarwal et al., PODS'12), so shuffled bytes are O(k × partitions)
  * regardless of vocabulary size.
  *
  * Guarantee: every item with true frequency > N/(k+1) is in the final
  * candidate set (decrements can only subtract N/(k+1) total from any
  * item). [[heavyHitters]] therefore recounts the ≤k candidates EXACTLY
  * in a second filtered scan and emits precisely the tokens with
  * count·(k+1) > N — a deterministic, sketch-error-free result that an
  * exact SQL oracle can reproduce.
  */
object Sketch {

  /** Misra–Gries k-counter summary over a token stream. Buffer =
    * (counters, items-processed); reduce/merge are associative and
    * commutative up to the summary guarantee, finish exposes both. */
  class MisraGries(k: Int)
      extends Aggregator[String, (Map[String, Long], Long),
        (Map[String, Long], Long)] {
    require(k > 0)

    def zero: (Map[String, Long], Long) = (Map.empty, 0L)

    def reduce(b: (Map[String, Long], Long), tok: String)
        : (Map[String, Long], Long) = {
      val (m, n) = b
      val m2 =
        if (m.contains(tok)) m.updated(tok, m(tok) + 1L)
        else if (m.size < k) m.updated(tok, 1L)
        else m.collect { case (t, c) if c > 1L => t -> (c - 1L) }
      (m2, n + 1L)
    }

    def merge(b1: (Map[String, Long], Long), b2: (Map[String, Long], Long))
        : (Map[String, Long], Long) = {
      val sum = b2._1.foldLeft(b1._1) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c)
      }
      val m =
        if (sum.size <= k) sum
        else {
          // subtract the (k+1)-th largest count from everything — the
          // merged-summary analogue of the streaming decrement
          val cut = sum.values.toSeq.sortBy(-_).apply(k)
          sum.collect { case (t, c) if c > cut => t -> (c - cut) }
        }
      (m, b1._2 + b2._2)
    }

    def finish(b: (Map[String, Long], Long)): (Map[String, Long], Long) = b

    def bufferEncoder: Encoder[(Map[String, Long], Long)] =
      Encoders.kryo[(Map[String, Long], Long)]
    def outputEncoder: Encoder[(Map[String, Long], Long)] =
      Encoders.kryo[(Map[String, Long], Long)]
  }

  /** Exact heavy hitters via sketch-then-recount: tokens of `textCol`
    * whose corpus frequency exceeds N/(k+1), with EXACT counts.
    * Pass 1 is the Misra–Gries all-reduce (driver receives ≤k
    * candidates — bounded, like the IVF centroid collect); pass 2
    * recounts only candidate tokens (an `isin` literal filter pushed
    * into the scan) and applies the exact integer threshold
    * `count · (k+1) > N`. */
  def heavyHitters(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    import docs.sparkSession.implicits._
    val toks = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val (cand, n) = toks.as[String]
      .select(new MisraGries(k).toColumn).head()
    val candidates = cand.keys.toSeq.sorted
    toks
      .filter(col("tok").isin(candidates: _*))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") * (k + 1) > n)
      .select(col("tok").as("token"), col("n_occurrences"))
  }
}
