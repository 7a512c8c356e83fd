package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IVMSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("k")

  test("refresh merges inserts, cancels retracts, drops zeroed groups") {
    val base = Seq(("a", 1.5), ("a", 2.5), ("b", 3.0)).toDF("k", "value")
    val v0 = IVM.init(base, keys, "value")
    // insert into a, retract one a row, retract b entirely, create c
    val d = Seq(("a", 1, 4.0), ("a", -1, 1.5), ("b", -1, 3.0),
      ("c", 1, 7.0)).toDF("k", "op", "value")
    val v1 = IVM.refresh(v0, d, keys, "value")
      .select($"k", $"n", $"val_dec".cast("double").as("v"))
      .orderBy($"k")
      .as[(String, Long, Double)].collect().toSeq
    // a: n=2+1-1=2, sum=1.5+2.5+4.0-1.5=6.5; b dropped (n=0); c new
    assert(v1 == Seq(("a", 2L, 6.5), ("c", 1L, 7.0)))
  }

  test("a refresh chain equals from-scratch recompute exactly") {
    val rows = (0L until 500L).map(i =>
      (s"k${i % 7}", (i % 13).toDouble / 8 + 0.1))
    val all = rows.toDF("k", "value").withColumn("id",
      monotonically_increasing_id())
    val base = all.filter($"id" % 3 =!= 2L)
    val d1 = all.filter($"id" % 3 === 2L && $"id" % 2 === 0L)
        .withColumn("op", lit(1))
      .unionByName(base.filter($"id" % 5 === 1L).withColumn("op", lit(-1)))
      .select($"k", $"op", $"value")
    val d2 = all.filter($"id" % 3 === 2L && $"id" % 2 === 1L)
        .withColumn("op", lit(1))
      .unionByName(base.filter($"id" % 5 === 3L).withColumn("op", lit(-1)))
      .select($"k", $"op", $"value")
    val inc = IVM.refresh(IVM.refresh(IVM.init(base, keys, "value"),
        d1, keys, "value"), d2, keys, "value")
    val scratch = base.withColumn("op", lit(1)).select($"k", $"op", $"value")
      .unionByName(d1).unionByName(d2)
      .groupBy($"k")
      .agg(sum($"op".cast("long")).as("n"),
        sum(($"value" * $"op").cast("decimal(38,12)")).as("val_dec"))
      .filter($"n" > 0L)
    val a = inc.orderBy($"k").collect().toSeq
    val b = scratch.orderBy($"k").collect().toSeq
    assert(a == b) // decimal sums: BIT-equal, not approximately
  }
}
