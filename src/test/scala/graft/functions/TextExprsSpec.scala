package graft.functions

import graft.SparkSpec
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** The TokenStats/MarkerCounts kernels must be bit-compatible with the
  * declarative spellings they replaced (and that every oracle still
  * rebuilds in SQL): split(text, ' ') with limit -1 keeps empty
  * segments, '' is a token, distinct includes '', char/alpha counts
  * are codepoint/ASCII-letter counts. */
class TextExprsSpec extends SparkSpec {
  import spark.implicits._

  private def stats(text: String): Seq[Int] =
    Seq(text).toDF("t")
      .select(TextAnalysis.tokenStats($"t").as("st"))
      .select($"st.n_tokens", $"st.n_stop", $"st.n_distinct",
        $"st.n_chars", $"st.n_alpha")
      .head().toSeq.map(_.asInstanceOf[Int])

  test("token_stats golden vectors incl. split-limit -1 edges") {
    assert(stats("the cat sat on the mat") == Seq(6, 2, 5, 17, 17))
    // empty text = one empty token, exactly like split('', ' ')
    assert(stats("") == Seq(1, 0, 1, 0, 0))
    // consecutive + trailing spaces keep empty segments
    assert(stats("a  b ") == Seq(4, 1, 3, 2, 2))
    // multi-byte codepoints count once and never hit [A-Za-z]
    assert(stats("é ß 漢字") == Seq(3, 0, 3, 4, 0))
  }

  test("token_stats == declarative split/filter spelling on real docs") {
    val sw = TextAnalysis.defaultStopwords
    val bad = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(
        TextAnalysis.tokenStats($"text").as("st"),
        size(split($"text", " ")).as("n"),
        size(filter(split($"text", " "),
          t => t.isin(sw.map(lit): _*))).as("ns"),
        size(array_distinct(split($"text", " "))).as("nd"),
        length(regexp_replace($"text", " ", "")).as("nc"),
        size(regexp_extract_all($"text", lit("[A-Za-z]"), lit(0)))
          .as("na"))
      .filter($"st.n_tokens" =!= $"n" || $"st.n_stop" =!= $"ns" ||
        $"st.n_distinct" =!= $"nd" || $"st.n_chars" =!= $"nc" ||
        $"st.n_alpha" =!= $"na")
    assert(bad.count() == 0)
  }

  test("marker_counts: multi-list tokens count for every owning list") {
    // langMarkers order en/de/fr/es/zh; 'le' is fr AND zh (pinyin),
    // 'de' is zh only (the German list has 'der', not 'de'), 'la' fr
    val r = Seq("le de la xx le").toDF("t")
      .select(TextAnalysis.markerCounts($"t").as("mc"))
      .head().getSeq[Int](0)
    assert(r == Seq(0, 0, 3, 0, 3))
  }

  test("marker_counts dedups WITHIN a list: a duplicated marker word " +
      "scores once, like the isin-filter it replaces") {
    val r = Seq("le la le").toDF("t")
      .select(TextExprs.markerCounts($"t",
        Seq(Seq("le", "le", "la"), Seq("xx"))).as("mc"))
      .head().getSeq[Int](0)
    assert(r == Seq(3, 0)) // le, la, le — not 5
  }

  test("predictLang tie keeps the earlier language (strict > fold)") {
    // fr and zh both score 3 above; list order says fr wins
    val l = Seq("le de la xx le").toDF("t")
      .select(TextAnalysis.predictLang($"t").as("l"))
      .head().getString(0)
    assert(l == "fr")
  }

  test("array_mode_count golden vectors incl. empty array") {
    def mode(xs: Seq[String]): (Int, Int) = {
      val r = Seq(Tuple1(xs)).toDF("a")
        .select(TextExprs.arrayModeCount($"a").as("m"))
        .select($"m.top_count", $"m.total").head()
      (r.getInt(0), r.getInt(1))
    }
    assert(mode(Seq("x", "y", "x", "x")) == (3, 4))
    assert(mode(Seq("x")) == (1, 1))
    assert(mode(Seq.empty) == (0, 0))
    assert(mode(Seq("", "", "a")) == (2, 3)) // '' is an element
  }

  test("array_mode_count == explode/groupBy mode on real doc bigrams") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id",
        HashExprs.shingleList(split($"text", " "), 2).as("bgs"))
    val kernel = docs.select($"doc_id",
      TextExprs.arrayModeCount($"bgs").getField("top_count")
        .cast("long").as("top"))
    val exploded = docs
      .select($"doc_id", explode($"bgs").as("bg"))
      .groupBy($"doc_id", $"bg").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id").agg(max($"c").as("top"))
    assert(kernel.join(exploded, Seq("doc_id"))
      .filter(kernel("top") =!= exploded("top")).count() == 0)
  }

  test("marker_counts == one filter-count per language on real docs") {
    val markers = TextAnalysis.langMarkers
    val perLang = markers.zipWithIndex.map { case ((lang, words), i) =>
      (size(filter(split($"text", " "),
        t => t.isin(words.map(lit): _*))) ===
        TextAnalysis.markerCounts($"text").getItem(i)).as(s"ok_$lang")
    }
    val bad = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(perLang: _*)
      .filter(markers.map(m => !col(s"ok_${m._1}"))
        .reduce(_ || _))
    assert(bad.count() == 0)
  }
}
