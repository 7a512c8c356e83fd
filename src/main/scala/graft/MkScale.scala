package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Generate a ~sf1 tier for the data-sensitive pipeline tail (VERDICT
  * r3 item 7): 10× `documents`, `embeddings`, and `events` derived from
  * sf0.1, DISTRIBUTION-preserving rather than row-cloning — naive
  * replication would hand every document ten exact twins and turn the
  * blocked-pair dedups into an adversarial 100× clique benchmark that
  * says nothing about natural growth.
  *
  *  - documents: replica r rotates each text's word sequence by r and
  *    rewrites every 5th word from the corpus vocabulary (seeded by
  *    (doc_id, r, position)) — same vocabulary, same length
  *    distribution, but replicas are far below any near-dup threshold,
  *    so pair structure grows ~linearly like fresh data would.
  *  - embeddings: replica r>0 gets an INDEPENDENT seeded unit gaussian
  *    vector (64-dim, like the originals) — near-orthogonal to
  *    everything else, as fresh embeddings are; labels keep the 0–9
  *    range so label-blocked queries see the same fan-out.
  *  - events: replica r shifts event_id by r·N and ts by r·(span+1 day)
  *    but KEEPS user_id — ten more seasons of history for the same
  *    players, so per-key ordered-window state (w1, the folds,
  *    sessionize) grows 10× per key, which is what actually stresses
  *    those plans; new users would instead grow only the key count,
  *    which windows parallelize over for free.
  *  - orders: same shape (o_orderkey shifted, o_custkey and
  *    o_orderpriority KEPT, o_orderdate advanced a season per replica)
  *    so the orders-backed windows (w2 per-customer rank/lag, w3/w4
  *    per-priority distribution frames — 5 fat partitions, the known
  *    window-skew shape) see 10× per-partition state.
  *
  *  These five tables are SCALED; the dimension tables (customer,
  *  part, supplier, nation, region) are copied through unscaled —
  *  present so dim-probing queries run at the tier, but a sweep must
  *  still restrict itself to queries whose GROWTH depends only on
  *  scaled tables (the pipeline tail + the window/fold family), or
  *  mixed-scale joins would measure nothing meaningful. The one
  *  deliberate exception is stream_static_join, which models the
  *  dim-fixed/stream-growing production shape.
  *
  * Usage: sbt "runMain graft.MkScale /root/testdata/sf0.1 /tmp/sf1 10" */
object MkScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.local(appName = "graft-mkscale")
    import spark.implicits._

    // Replica keys shift by a per-table STRIDE = max(id)+1, not the
    // row count: with sparse ids (TPC-H-style orderkeys run to ~4×
    // count) a count-based shift would collide replicas into
    // duplicate keys (ADVICE r6). Current testdata is contiguous
    // 0..N−1, where stride == count — behavior unchanged there.
    def stride(df: org.apache.spark.sql.DataFrame, id: String): Long =
      df.agg(max(col(id))).head().getLong(0) + 1L

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val nDocs = docs.count()
    val docStride = stride(docs, "doc_id")
    val vocab = docs.select(explode(split($"text", " ")).as("w"))
      .distinct().orderBy($"w").as[String].collect()
    val vocabB = spark.sparkContext.broadcast(vocab)
    val replicas = spark.range(factor).select($"id".cast("int").as("r"))
    docs.crossJoin(replicas)
      .as[(Long, String, String, String, Long, Int)]
      .map { case (id, text, lang, source, _, r) =>
        val out =
          if (r == 0) text
          else {
            val v = vocabB.value
            val words = text.split(" ")
            val rot = if (words.isEmpty) 0 else r % words.length
            val rotated = words.drop(rot) ++ words.take(rot)
            var i = 0
            while (i < rotated.length) {
              if ((i + r) % 5 == 0) {
                val h = id * 1000003L + r * 7919L + i * 31L
                rotated(i) = v((Math.floorMod(h, v.length)).toInt)
              }
              i += 1
            }
            rotated.mkString(" ")
          }
        (id + r * docStride, out, lang, source, out.length.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val nVecs = emb.count()
    val vecStride = stride(emb, "vec_id")
    val dim = emb.select(size($"embedding")).head().getInt(0)
    emb.crossJoin(replicas)
      .as[(Long, Array[Float], Int, Int)]
      .map { case (id, vec, label, r) =>
        val out =
          if (r == 0) vec
          else {
            val rnd = new java.util.Random(id * 1000003L + r * 7919L)
            val g = Array.fill(dim)(rnd.nextGaussian())
            val norm = math.sqrt(g.map(x => x * x).sum)
            g.map(x => (x / norm).toFloat)
          }
        (id + r * vecStride, out, label)
      }
      .toDF("vec_id", "embedding", "label")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    // events.ts is TIMESTAMP_NTZ at µs precision: shift replicas in
    // exact integer µs (unix_micros under the UTC-pinned session — the
    // seconds-granularity hop orders uses below would round away the
    // sub-second spacing the session/window queries depend on) and
    // rebuild the NTZ column so the derived tier keeps the source schema
    val ev = spark.read.parquet(s"$src/events.parquet")
    val nEvents = ev.count()
    val evStride = stride(ev, "event_id")
    val tsUs = unix_micros($"ts".cast("timestamp"))
    val span = ev.agg(
        (max(tsUs) - min(tsUs) + 86400L * 1000000L).as("span"))
      .head().getLong(0)
    ev.crossJoin(replicas)
      .select(
        ($"event_id" + $"r".cast("long") * evStride).as("event_id"),
        timestamp_micros(tsUs + $"r".cast("long") * span)
          .cast("timestamp_ntz").as("ts"),
        $"user_id", $"event_type", $"value", $"props")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dst/events.parquet")

    val ord = spark.read.parquet(s"$src/orders.parquet")
    val nOrders = ord.count()
    val ordStride = stride(ord, "o_orderkey")
    // o_orderdate is TIMESTAMP_NTZ: no direct long cast, hop via LTZ
    val odSec = $"o_orderdate".cast("timestamp_ltz").cast("long")
    val ordSpan = ord.agg(
        (max(odSec) - min(odSec) + 86400L).as("span"))
      .head().getLong(0)
    ord.crossJoin(replicas)
      .select(
        ($"o_orderkey" + $"r".cast("long") * ordStride).as("o_orderkey"),
        $"o_custkey", $"o_orderstatus", $"o_totalprice",
        (odSec + $"r".cast("long") * ordSpan)
          .cast("timestamp_ltz").cast("timestamp_ntz").as("o_orderdate"),
        $"o_orderpriority")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dst/orders.parquet")

    // lineitem rides orders' stride so replica join keys stay valid
    // (l_orderkey must land on the SAME shifted o_orderkey); dates
    // advance by the orders span for rough temporal alignment. Values
    // (qty/price/discount/tax/flags) are kept — fresh business rows
    // reuse the same value domains, so NDV of the value columns stays
    // put while key NDV grows 10×, which is the realistic profile
    // shape (profile_columns/histogram_prices sweep).
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val nLines = li.count()
    val sdSec = $"l_shipdate".cast("timestamp_ltz").cast("long")
    li.crossJoin(replicas)
      .select(
        ($"l_orderkey" + $"r".cast("long") * ordStride).as("l_orderkey"),
        $"l_partkey", $"l_suppkey", $"l_linenumber", $"l_quantity",
        $"l_extendedprice", $"l_discount", $"l_tax", $"l_returnflag",
        $"l_linestatus",
        (sdSec + $"r".cast("long") * ordSpan)
          .cast("timestamp_ltz").cast("timestamp_ntz").as("l_shipdate"))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")

    // Dimension tables ride along UNSCALED (dim-fixed/stream-growing
    // is the production shape stream_static_join's sweep row models;
    // customer was first copied by hand in r8 when the gate hit a
    // missing-table AnalysisException at /tmp/sf1). They are copies,
    // not scaled data — the sweep's scaled-tables-only rule still
    // excludes queries whose GROWTH depends on them.
    for (dim <- Seq("customer", "part", "supplier", "nation", "region")) {
      val p = s"$src/$dim.parquet"
      if (new java.io.File(p).exists())
        spark.read.parquet(p).coalesce(1)
          .write.mode("overwrite").parquet(s"$dst/$dim.parquet")
    }

    println(s"wrote $dst: documents=${nDocs * factor} " +
      s"lineitem=${nLines * factor} " +
      s"embeddings=${nVecs * factor} events=${nEvents * factor} " +
      s"orders=${nOrders * factor} (+ unscaled dims)")
    spark.stop()
  }
}
