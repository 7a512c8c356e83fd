package graft.queries

import org.apache.spark.sql.functions._
import graft.{GQuery, Tables => T}
import graft.operators.GraphOps

/** Graph analytics over the part co-purchase graph (parts that share
  * an order are linked — the classic market-basket projection of the
  * order↔part bipartite graph). Complements the label-propagation
  * connected components already gated via dedup_clusters: PageRank is
  * the weighted-iteration shape (source-authority scoring for a
  * training corpus), triangles/wedges the combinatorial one
  * (community density).
  *
  * Both queries are exact-integer end to end, so the oracle hashes are
  * bit-stable under any partitioning.
  */
object Graph {

  private val edgeCte = """
      WITH li AS (SELECT l_orderkey AS ok, l_partkey AS p FROM lineitem),
      edges AS (
        SELECT DISTINCT a.p AS src, b.p AS dst
        FROM li a JOIN li b ON a.ok = b.ok AND a.p <> b.p)"""

  /** Six damped rounds of integer-exact PageRank over the symmetric
    * co-purchase graph. Each round is one keyed join + one keyed
    * aggregation with a lineage cut — the connected-components
    * execution shape with a weighted message. See
    * [[GraphOps.pagerankExact]] for the determinism and overflow
    * analysis; the oracle is the generated unrolled-CTE mirror of the
    * same integer recurrence. */
  val graph_pagerank = GQuery(
    "graph_pagerank",
    (s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d)
        .select($"l_orderkey".as("ok"), $"l_partkey".as("p"))
      val edges = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.p") =!= col("b.p"))
        .select(col("a.p").as("src"), col("b.p").as("dst"))
        .distinct()
      GraphOps.pagerankExact(edges, "src", "dst", iters = 6)
        .orderBy($"node")
    },
    Some(GraphOps.pagerankOracle(edgeCte, iters = 6)))

  /** Exact triangle + wedge census via degree orientation (each edge
    * points up the (deg, id) total order; wedges enumerate only
    * oriented out-neighbor pairs, so hub nodes never square their
    * neighborhoods — wedge work is Σ C(outdeg,2) = O(m·√m) worst
    * case, linear on this constant-degree graph). The oracle counts
    * the same triangles the textbook way (u<v<w chain join), which is
    * fine at oracle SF and proves the oriented count is not just
    * self-consistent. */
  val graph_triangles = GQuery(
    "graph_triangles",
    (s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d)
        .select($"l_orderkey".as("ok"), $"l_partkey".as("p"))
      val und = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
        .select(col("a.p").as("u"), col("b.p").as("v"))
        .distinct()
      GraphOps.triangleCounts(und, "u", "v")
    },
    Some("""
      WITH li AS (SELECT l_orderkey AS ok, l_partkey AS p FROM lineitem),
      und AS (
        SELECT DISTINCT a.p AS u, b.p AS v
        FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
      sym AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
      deg AS (SELECT u, COUNT(*) AS deg FROM sym GROUP BY u),
      wedges AS (SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT)
                   AS n_wedges FROM deg),
      tri AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM und e1 JOIN und e2 ON e1.v = e2.u
                    JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v)
      SELECT n_triangles, n_wedges FROM tri, wedges"""))

  val all: Seq[GQuery] = Seq(graph_pagerank, graph_triangles)
}
