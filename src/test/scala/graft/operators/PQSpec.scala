package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product-quantization ANN invariants: with rerank covering the whole
  * corpus the ADC scan only selects, so the result must EQUAL brute
  * force row-for-row (the PQ analog of IVF's full-probe proof);
  * bounded rerank must still clear the recall bar the oracle gates;
  * and the whole path must be deterministic across invocations (the
  * quantizer trains on a hash-ordered sample with seeded Lloyd). */
class PQSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def vecs = spark.read.parquet(s"$sf/embeddings.parquet")

  test("full-rerank PQ == brute force row-for-row") {
    val q = vecs.filter(col("vec_id") < 10)
    val pq = Similarity.pqTopK(vecs, q, "vec_id", "embedding", 5,
      rerank = Int.MaxValue).orderBy("query_id", "rank").collect()
    val bf = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 5)
      .orderBy("query_id", "rank").collect()
    assert(pq.length == bf.length && pq.nonEmpty)
    pq.zip(bf).foreach { case (a, b) => assert(a == b, s"$a vs $b") }
  }

  test("bounded rerank keeps recall; path is deterministic") {
    val q = vecs.filter(col("vec_id") < 50)
    def run() = Similarity.pqTopK(vecs, q, "vec_id", "embedding", 5,
      rerank = 32).orderBy("query_id", "rank").collect()
    val r1 = run(); val r2 = run()
    assert(r1.toSeq == r2.toSeq, "PQ result not deterministic")
    val bf = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = r1.count(r => bf((r.getLong(0), r.getLong(1))))
    val recall = hits.toDouble / bf.size
    info(f"PQ rerank=32 recall@5 over 50 queries: $recall%.3f")
    assert(recall >= 0.60, f"recall $recall%.3f below spec bar 0.60")
  }

  test("IVF-PQ: deterministic, well-formed top-k, no self-match") {
    val q = vecs.filter(col("vec_id") < 20)
    def run() = Similarity.ivfPqTopK(vecs, q, "vec_id", "embedding", 5,
      nprobe = 4, rerank = 32).orderBy("query_id", "rank").collect()
    val r1 = run(); val r2 = run()
    assert(r1.toSeq == r2.toSeq, "IVF-PQ result not deterministic")
    assert(r1.nonEmpty)
    r1.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val ranks = rows.map(_.getInt(2)).sorted
      assert(ranks.head == 1 && ranks.toSeq == (1 to ranks.length),
        s"ranks not contiguous-from-1 for query $qid: ${ranks.toSeq}")
      val cs = rows.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b - 1e-9 },
        s"cos not non-increasing for query $qid")
      assert(rows.forall(r => r.getLong(1) != qid), s"self-match $qid")
    }
  }
}
