package graft

/** Every registered query must execute end-to-end at the smallest
  * scale factor — catches a broken query before the driver's
  * correctness gate does, and pins registry/oracle consistency. */
class QuerySmokeSpec extends SparkSpec {

  test("driver entry() returns rows (the driver smoke-checks rows>0)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle entries reference registered queries only") {
    val unknown = Registry.oracleMap.keySet -- Registry.queryMap.keySet
    assert(unknown.isEmpty, s"oracles without queries: $unknown")
  }

  test("query names are unique across modules") {
    val names = Registry.all.map(_.name)
    val dup = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dup.isEmpty, s"duplicate query names: $dup")
  }

  test("concurrent query execution is thread-safe") {
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration.Duration
    val sf = "/root/testdata/sf0.001"
    // includes SQL-text queries so the synchronized view registration
    // races are exercised, not just pure-DataFrame plans
    val names = Seq("q1_agg", "f5_topk", "agg_rollup", "sub_exists",
      "j1_join_broadcast", "str_funcs", "w3_distribution", "agg_distinct")
    val expected =
      names.map(n => n -> Registry.queryMap(n)(spark, sf).count()).toMap
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutor(pool)
    try {
      val futs = (1 to 3).flatMap(_ => names.map(n =>
        Future(n -> Registry.queryMap(n)(spark, sf).count())))
      val res = Await.result(Future.sequence(futs), Duration("180s"))
      res.foreach { case (n, c) =>
        assert(c == expected(n), s"$n: $c != ${expected(n)} under concurrency")
      }
    } finally pool.shutdown()
  }

  test("registry-wide: no ScalaUDF/PythonUDF in any query's optimized " +
      "plan (codegen'd expressions only)") {
    val sf = "/root/testdata/sf0.001"
    import org.apache.spark.sql.catalyst.expressions.ScalaUDF
    // Framework-INTERNAL UDFs, not authored in this repo: MLlib's
    // model.transform prediction column is a ScalaUDF inside Spark
    // itself (the KMeans/regression contract queries are spec-mandated
    // MLlib), and df.stat.sampleBy's per-stratum filter is a Spark
    // ScalaUDF. Everything the ENGINE authors must be codegen'd
    // expressions; any new name appearing here is a regression.
    val frameworkUdfQueries = Set(
      "ml_kmeans_contract", "ml_quadfit_contract", "sample_stratified")
    val offenders = Registry.all
      .filterNot(q => frameworkUdfQueries(q.name)).flatMap { q =>
      // analyzed, not executed: lifecycle queries run their table
      // setup when fn is invoked, but plan inspection adds no second
      // execution
      val plan = q.fn(spark, sf).queryExecution.optimizedPlan
      val hasUdf = plan.expressions.exists(_.exists {
        case _: ScalaUDF => true
        case e => e.getClass.getSimpleName.contains("PythonUDF")
      }) || plan.collect {
        case p if p.expressions.exists(_.exists {
          case _: ScalaUDF => true
          case e => e.getClass.getSimpleName.contains("PythonUDF")
        }) => p
      }.nonEmpty
      if (hasUdf) Some(q.name) else None
    }
    assert(offenders.isEmpty,
      s"queries carrying UDFs in the hot path: $offenders")
  }

  test("registry-wide: no CartesianProduct in any query's physical " +
      "plan (1-row assemblies must broadcast)") {
    val sf = "/root/testdata/sf0.001"
    // deliberate cross joins in the registry are 1-row contract /
    // bounds assemblies — they must plan as BroadcastNestedLoopJoin,
    // never CartesianProductExec (which shuffles BOTH sides N×M and
    // is the canonical 100 TB plan disaster)
    val offenders = Registry.all.flatMap { q =>
      val p = q.fn(spark, sf).queryExecution.sparkPlan
      if (p.collect {
        case n if n.getClass.getSimpleName == "CartesianProductExec" => n
      }.nonEmpty) Some(q.name) else None
    }
    assert(offenders.isEmpty,
      s"queries planning a cartesian product: $offenders")
  }

  test("registry-wide: no UnboundedFollowing window frame in any " +
      "query's physical plan (O(n²) per key — use a reversed running " +
      "frame)") {
    val sf = "/root/testdata/sf0.001"
    // Spark's UnboundedFollowingWindowFunctionFrame re-aggregates the
    // ENTIRE remaining frame for every row: O(n²) per partition key.
    // resample_interp's first spelling sat single-threaded >20 min at
    // sf0.1 in exactly that frame (docs/PERF.md rescue #3); the O(n)
    // spelling of any "nearest following" carry is a running frame
    // over the REVERSED ordering. NB the whole-partition frame
    // (UNBOUNDED PRECEDING → UNBOUNDED FOLLOWING, what an
    // orderBy-less window plans as) is FINE — Spark evaluates it once
    // per partition (UnboundedWindowFunctionFrame, O(n)); only a
    // frame whose LOWER bound varies while the upper end is the
    // partition end pays the per-row rescan. This audit makes the
    // lesson structural: any query that reintroduces the frame fails
    // here with a name, not in a wedged benchmark.
    import org.apache.spark.sql.catalyst.expressions.{
      SpecifiedWindowFrame, UnboundedFollowing, UnboundedPreceding}
    val offenders = Registry.all.flatMap { q =>
      val plan = q.fn(spark, sf).queryExecution.sparkPlan
      val hit = plan.collect {
        case n if n.expressions.exists(_.exists {
          case SpecifiedWindowFrame(_, lower, UnboundedFollowing) =>
            lower != UnboundedPreceding
          case _ => false
        }) => n
      }.nonEmpty
      if (hit) Some(q.name) else None
    }
    assert(offenders.isEmpty,
      s"queries planning an UnboundedFollowing window frame: $offenders")
  }

  test("every registered query executes at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val failures = Registry.all.flatMap { q =>
      try {
        q.fn(spark, sf).count(); None
      } catch {
        case e: Throwable => Some(q.name -> String.valueOf(e).take(160))
      }
    }
    assert(failures.isEmpty,
      failures.map { case (n, m) => s"$n: $m" }.mkString("\n"))
  }
}
