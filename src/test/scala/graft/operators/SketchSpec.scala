package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("misra-gries summary: heavy items survive a long rare tail " +
      "with only k counters") {
    // 3 heavy tokens (400/300/200 of N=1900) drowned in 1000 singletons;
    // k=10 counters, threshold N/11 ≈ 172 → exactly the heavy 3 qualify
    val text = (Seq.fill(400)("alpha") ++ Seq.fill(300)("beta") ++
      Seq.fill(200)("gamma") ++ (0 until 1000).map(i => s"rare$i"))
    // spread across many docs/partitions so merge() is exercised
    val docs = text.grouped(25).zipWithIndex
      .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }.toSeq
      .toDF("doc_id", "text").repartition(8)
    val got = Sketch.heavyHitters(docs, "text", 10).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_occurrences")).toMap
    assert(got == Map("alpha" -> 400L, "beta" -> 300L, "gamma" -> 200L))
  }

  test("misra-gries guarantee holds on the adversarial " +
      "just-over-threshold item") {
    // item at exactly floor(N/(k+1))+1 occurrences must be found
    val heavy = Seq.fill(101)("edge")            // N=1100, k=10 → N/11=100
    val tail = (0 until 999).map(i => s"t$i")
    val docs = (heavy ++ tail).grouped(40).zipWithIndex
      .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }.toSeq
      .toDF("doc_id", "text").repartition(5)
    val got = Sketch.heavyHitters(docs, "text", 10).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_occurrences")).toMap
    assert(got == Map("edge" -> 101L))
  }

  test("tf-idf: corpus-wide words rank below doc-specific words, " +
      "ranks contiguous, deterministic ties") {
    val docs = Seq(
      (1L, "common common zebra common"),
      (2L, "common yak yak"),
      (3L, "common plain words here"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.topTfIdf(docs, "doc_id", "text", 2).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Int]("term_rank")) ->
        x.getAs[String]("token")).toMap
    // doc 1: common 3·4/(4·4)=0.75 > zebra 1·4/(4·2)=0.5 (tf dominates)
    assert(r((1L, 1)) == "common" && r((1L, 2)) == "zebra")
    // doc 2: yak 2·4/(3·2)=1.33 > common 1·4/(3·4)=0.33 (df penalizes)
    assert(r((2L, 1)) == "yak")
    // doc 3: every df=1 word scores 0.5 > common 0.25; tie → token asc
    assert(r((3L, 1)) == "here" && r((3L, 2)) == "plain")
  }
}
