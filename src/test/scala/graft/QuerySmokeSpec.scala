package graft

/** Every registered query must execute end-to-end at the smallest
  * scale factor — catches a broken query before the driver's
  * correctness gate does, and pins registry/oracle consistency. */
class QuerySmokeSpec extends SparkSpec {

  test("oracle entries reference registered queries only") {
    val unknown = Registry.oracleMap.keySet -- Registry.queryMap.keySet
    assert(unknown.isEmpty, s"oracles without queries: $unknown")
  }

  test("query names are unique across modules") {
    val names = Registry.all.map(_.name)
    val dup = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dup.isEmpty, s"duplicate query names: $dup")
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
