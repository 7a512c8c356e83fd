package graft

import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan audits: the 100-TB posture checks that `.explain`
  * would show by hand — pushdown reaching the parquet scan, dims
  * broadcast, top-k not globally sorting, codegen covering the hot
  * path. These pin the *plan shape*, so a regression that silently
  * de-optimizes (e.g. a lost broadcast or a filter stuck above a join)
  * fails the suite, not just the benchmark. */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def plan(name: String, mode: String = "formatted"): String =
    Registry.queryMap(name)(spark, sf).queryExecution
      .explainString(ExplainMode.fromString(mode))

  test("f1: filter and projection push down into the parquet scan") {
    val p = plan("f1_filter_project")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    assert(p.contains("GreaterThan(l_quantity,45.0)"), p)
    // pruned read schema: referenced columns only, not all 11
    assert(!p.contains("l_extendedprice"), "column pruning lost:\n" + p)
  }

  test("f3: point lookup pushes the equality predicate") {
    val p = plan("f3_point_lookup")
    assert(p.contains("EqualTo(c_name,Customer#000000042)"), p)
  }

  test("j1/j2: dimension joins are broadcast, not shuffled") {
    assert(plan("j1_join_broadcast").contains("BroadcastHashJoin"))
    val j2 = plan("j2_multi_join")
    assert(j2.contains("BroadcastHashJoin"), j2)
    // the only non-broadcast join permitted is fact-fact orders⋈lineitem
    assert(j2.split("SortMergeJoin").length <= 2, j2)
  }

  test("f5: top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = plan("f5_topk", "simple")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Sort ["), "global sort for a limit-10:\n" + p)
  }

  test("q1: one data shuffle (partial→final agg) + output ordering only") {
    val p = plan("q1_agg", "simple")
    assert(p.split("Exchange").length - 1 == 2, "exchanges changed:\n" + p)
    assert(p.contains("partial_sum"), "map-side partial agg lost:\n" + p)
  }

  test("q1 runs inside whole-stage codegen (post-AQE executed plan)") {
    val df = Registry.queryMap("q1_agg")(spark, sf)
    df.collect() // execute THIS dataframe so its adaptive plan finalizes
    val p = df.queryExecution.executedPlan.toString
    // codegen stages print as "*(n) HashAggregate..." in the final plan
    assert("\\*\\(\\d+\\)".r.findFirstIn(p).isDefined, p.take(1500))
  }

  test("semi/anti joins plan as semi/anti, not inner+distinct") {
    assert(plan("j5_semi_join", "simple").contains("LeftSemi"))
    assert(plan("j5_anti_join", "simple").contains("LeftAnti"))
  }

  test("minhash: signature kernel runs below the first (tiny) exchange") {
    val p = plan("dedup_minhash_lsh", "simple")
    // partial_min of the per-doc signature must happen map-side, before
    // any exchange — i.e. the expensive kernel is scan-parallel and the
    // shuffle carries one signature row per doc
    val firstExchange = p.indexOf("Exchange")
    val partialMin = p.indexOf("partial_min")
    assert(partialMin > firstExchange && firstExchange >= 0,
      "plan prints top-down, so map-side partial_min must appear BELOW " +
        "(after) the exchange that consumes it:\n" + p)
  }
}
