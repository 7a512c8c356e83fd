package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("topK keeps the K smallest (pri, id) pairs, ascending") {
    val df = Seq(
      ("g1", "c", 1L), ("g1", "a", 2L), ("g1", "b", 3L), ("g1", "a", 1L),
      ("g2", "z", 9L)).toDF("g", "pri", "id")
    val out = df.groupBy($"g").agg(TopK.topK($"pri", $"id", 2).as("t"))
      .select($"g", $"t").as[(String, Seq[(String, Long)])]
      .collect().toMap
    // g1: sorted pairs (a,1),(a,2),(b,3),(c,1) -> top2 = (a,1),(a,2)
    assert(out("g1") == Seq(("a", 1L), ("a", 2L)))
    // undersized group: all entries, still sorted
    assert(out("g2") == Seq(("z", 9L)))
  }

  test("partial-merge boundaries preserve the selection exactly") {
    // enough rows across many partitions that map-side partials MUST
    // merge; equality against the window form proves merge correctness
    val n = 5000
    val rows = (0 until n).map(i => (s"g${i % 7}",
      f"p${(i * 2654435761L) % 100000}%06d", i.toLong))
    val df = rows.toDF("g", "pri", "id").repartition(13)
    val agg = df.groupBy($"g").agg(TopK.topK($"pri", $"id", 5).as("t"))
      .select($"g", posexplode($"t").as(Seq("pos", "e")))
      .select($"g", ($"pos" + 1).as("rk"), $"e.pri".as("pri"),
        $"e.id".as("id"))
    val win = df.withColumn("rk",
        row_number().over(Window.partitionBy($"g")
          .orderBy($"pri", $"id")))
      .filter($"rk" <= 5).select($"g", $"rk".cast("int").as("rk"),
        $"pri", $"id")
    assert(agg.orderBy($"g", $"rk").collect().toSeq ==
      win.orderBy($"g", $"rk").collect().toSeq)
  }

  test("duplicate priorities tie-break by id") {
    val df = Seq(("g", "same", 5L), ("g", "same", 1L), ("g", "same", 3L))
      .toDF("g", "pri", "id")
    val out = df.groupBy($"g").agg(TopK.topK($"pri", $"id", 2).as("t"))
      .select($"t").as[Seq[(String, Long)]].head()
    assert(out == Seq(("same", 1L), ("same", 3L)))
  }
}
