package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior pins for the retrieval surface (the oracle gate checks
  * exact values; these pin the SEMANTICS a refactor could silently
  * change while still matching some oracle). */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("bm25: ranked by rounded score desc with doc_id tie-break, " +
      "rare-term docs outrank common-only docs") {
    val rows = Retrieval.bm25_topk.fn(spark, sf)
      .select($"doc_id", $"tf_dup", $"score").collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "not sorted by score desc")
    rows.sliding(2).foreach { w =>
      if (w.length == 2 && w(0).getDouble(2) == w(1).getDouble(2))
        assert(w(0).getLong(0) < w(1).getLong(0), "tie not broken by doc_id")
    }
    // 'dup' appears in ~5% of docs → its idf dwarfs the common terms';
    // every top-10 doc must contain it (a ranking bug that ignores idf
    // would instead surface high-tf common-term docs)
    assert(rows.forall(_.getLong(1) > 0),
      "a doc without the rare term reached the top 10")
  }

  test("bm25 HOF and join variants agree: same top-10 docs, same " +
      "rounded scores (two independent plans, one ranking function)") {
    val hof = Retrieval.bm25_topk.fn(spark, sf)
      .select($"doc_id", $"score").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val join = Retrieval.bm25_join_topk.fn(spark, sf)
      .select($"doc_id", $"score").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(hof.map(_._1).toSeq == join.map(_._1).toSeq,
      s"rankings diverge: ${hof.toSeq} vs ${join.toSeq}")
    hof.zip(join).foreach { case ((_, a), (_, b)) =>
      assert(math.abs(a - b) <= 1e-6, s"scores diverge: $a vs $b")
    }
  }

  test("postings: prefix is the 5 smallest doc_ids, ascending; df/tf " +
      "are consistent") {
    val rows = Retrieval.index_postings.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getAs[Long]("df")
      val totalTf = r.getAs[Long]("total_tf")
      val ids = r.getAs[String]("postings").split(",").map(_.toLong)
      assert(ids.length == math.min(df, 5L),
        s"${r.getAs[String]("term")}: prefix length ${ids.length} != min(df=$df, 5)")
      assert(ids.sorted.sameElements(ids), "prefix not ascending")
      assert(totalTf >= df, "total tf < df is impossible")
    }
  }

}
