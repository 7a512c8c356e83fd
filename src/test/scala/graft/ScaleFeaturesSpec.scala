package graft

import org.apache.spark.sql.functions._

/** Scale-feature demonstrations that don't fit the oracle surface:
  * bucketed co-located joins (shuffle-free fact-fact), partition
  * pruning, and the RocksDB state store for streaming state. */
class ScaleFeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables co-locate the join: no exchange above the scan") {
    // at sf0.001 the dim side broadcasts; force the sort-merge path the
    // bucketing is for (at 100 TB neither fact side broadcasts)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try bucketedJoinBody()
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      prevThreshold)
  }

  private def bucketedJoinBody(): Unit = {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
    li.write.mode("overwrite").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")
    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus")
      .agg(sum(dec2($"l_quantity")).cast("double").as("qty"))
    val plan = joined.queryExecution.executedPlan.toString
    // both sides pre-bucketed on the join key → SortMergeJoin reads
    // bucket-aligned scans with NO shuffle below the join
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, plan)
    val below = plan.substring(joinIdx)
    assert(!below.contains("Exchange hashpartitioning"),
      "bucketed join still shuffles:\n" + plan)
    // sanity: same result as the plain join
    val plain = li.join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus")
      .agg(sum(dec2($"l_quantity")).cast("double").as("qty"))
    assert(joined.orderBy("o_orderstatus").collect().toSeq ==
      plain.orderBy("o_orderstatus").collect().toSeq)
  }

  private def dec2(c: org.apache.spark.sql.Column) =
    c.cast(org.apache.spark.sql.types.DecimalType(38, 2))

  test("AQE splits a skewed join partition at runtime") {
    // a viral key owns half the fact table; with skew-join handling the
    // oversized shuffle partition is split instead of pinning one task
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val big = spark.range(200000).select(
        when($"id" % 2 === 0, lit(7L)).otherwise($"id").as("k"),
        $"id".as("payload"))
      val small = spark.range(1000).toDF("k")
      // distribution-free global agg: a same-key groupBy downstream
      // would pin the join's hash partitioning and forbid the split
      val j = big.join(small, "k").agg(sum($"payload").as("s"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "AQE did not mark the skewed join:\n" + plan.take(3000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("partition pruning: only matching partitions are scanned") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part")
    Tables.orders(spark, "/root/testdata/sf0.001")
      .withColumn("month", date_format($"o_orderdate", "yyyy-MM"))
      .write.mode("overwrite").partitionBy("month")
      .parquet(dir.toString)
    val pruned = spark.read.parquet(dir.toString)
      .filter($"month" === "1997-03")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(month"), plan)
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
          .length }
    assert(scanned.forall(_ == 1), s"scanned partitions: $scanned")
  }

  test("streaming state runs on the RocksDB state store provider") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[String]
      val q = graft.streaming.FplStream.matchCloses(
          graft.streaming.FplStream.toMessages(stream.toDF()))
        .writeStream.format("memory").queryName("rocksdb_closes")
        .outputMode("append").start()
      try {
        val sentinel = graft.fpl.Fixture.matchJson
          .replace("\"wyId\":1001", "\"wyId\":9999")
        stream.addData(graft.fpl.Fixture.allLines :+ sentinel)
        q.processAllAvailable()
        assert(spark.table("rocksdb_closes").count() == 7)
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
