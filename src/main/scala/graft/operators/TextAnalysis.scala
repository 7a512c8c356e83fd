package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token statistics, quality scoring, language-ID heuristics, document
  * fingerprints. All pure column algebra — codegen-friendly, no UDFs,
  * scan-parallel at any scale (each document is scored independently;
  * no shuffle at all until an aggregation is requested).
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword-ish tokens: letter runs, digit runs, single
    * punctuation — the classic pre-tokenizer regex shape. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text))
  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))
  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text)))

  /** Character length excluding spaces. */
  def charLen(text: Column): Column =
    length(regexp_replace(text, " ", ""))

  val defaultStopwords: Seq[String] = Seq("the", "a", "of", "and", "to")

  /** Single-pass token statistics — struct(n_tokens, n_stop,
    * n_distinct, n_chars, n_alpha), computed by the native
    * [[graft.functions.TokenStats]] kernel (one walk over the UTF-8
    * bytes; the equivalent declarative spelling — one split + filter
    * HOF per field — runs interpreted per element and is what every
    * oracle rebuilds in SQL). Select this ONCE and derive ratios from
    * the struct fields; see the text_quality query for the pattern. */
  def tokenStats(text: Column,
      stopwords: Seq[String] = defaultStopwords): Column =
    graft.functions.TextExprs.tokenStats(text, stopwords)

  /** Mean token length (chars per token). */
  def meanTokenLen(text: Column): Column = {
    val st = tokenStats(text)
    st.getField("n_chars").cast("double") /
      st.getField("n_tokens").cast("double")
  }

  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    tokenStats(text, stopwords).getField("n_stop")

  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val st = tokenStats(text, stopwords)
    st.getField("n_stop").cast("double") /
      st.getField("n_tokens").cast("double")
  }

  /** Distinct/total token ratio — low values indicate boilerplate /
    * repetition (a standard pretraining-quality signal). */
  def distinctRatio(text: Column): Column = {
    val st = tokenStats(text)
    st.getField("n_distinct").cast("double") /
      st.getField("n_tokens").cast("double")
  }

  /** Composite quality score ∈ [0,1]: length window + stopword presence
    * + repetition + alphabetic purity, equally weighted. The formula is
    * fixed left-associated arithmetic so it reproduces bit-identically
    * in any engine. */
  def qualityScore(text: Column,
      minTokens: Int = 20, maxTokens: Int = 200,
      stopwords: Seq[String] = defaultStopwords): Column =
    qualityFromStats(tokenStats(text, stopwords), minTokens, maxTokens)

  /** The quality formula over an already-materialized [[tokenStats]]
    * struct — use this form inside multi-metric projections so the
    * kernel runs once per row, not once per derived column. */
  def qualityFromStats(st: Column,
      minTokens: Int = 20, maxTokens: Int = 200): Column = {
    val n = st.getField("n_tokens")
    val nc = st.getField("n_chars")
    val wLen = when(n >= minTokens && n <= maxTokens, 1.0).otherwise(0.0)
    val sr = st.getField("n_stop").cast("double") / n.cast("double")
    val wStop = when(sr >= 0.01 && sr <= 0.6, 1.0).otherwise(0.0)
    // ADVICE-r9: guard the 0/0 ratios — an all-whitespace document has
    // n_tokens = n_chars = 0, and an unguarded NaN score diverges the
    // engines downstream (Spark CAST(NaN AS BIGINT) = 0, DuckDB
    // errors). Degenerate docs score the term 0.0 in BOTH spellings.
    val wDup = when(n > 0,
      st.getField("n_distinct").cast("double") / n.cast("double"))
      .otherwise(0.0)
    val wAlpha = when(nc > 0,
      st.getField("n_alpha").cast("double") / nc.cast("double"))
      .otherwise(0.0)
    lit(0.25) * wLen + lit(0.25) * wStop + lit(0.25) * wDup +
      lit(0.25) * wAlpha
  }

  /** Per-language stopword marker lists for the n-gram/stopword
    * language-ID heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"),
    "zh" -> Seq("de", "shi", "le", "he", "zai"))

  /** Per-language marker hit counts (array<int>, index-aligned with
    * [[langMarkers]]) — one native-kernel pass over the text. */
  def markerCounts(text: Column): Column =
    graft.functions.TextExprs.markerCounts(text, langMarkers.map(_._2))

  /** Language-ID argmax over a materialized [[markerCounts]] column,
    * ties broken by list order (en > de > fr > es > zh) — fully
    * deterministic. The fold keeps (bestLang, bestScore) with strict
    * `>`; each level references its accumulator twice, so the tree
    * doubles per language — safe ONLY over a cheap column reference.
    * Feeding it expressions instead (the pre-round-6 spelling, one
    * interpreted filter HOF per language) replicated the en-marker
    * scan 2^4 times. */
  def langFromCounts(counts: Column): Column = {
    val scores = langMarkers.indices.map(i =>
      langMarkers(i)._1 -> counts.getItem(i))
    scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bl, bs), (l, s)) =>
        (when(s > bs, lit(l)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }._1
  }

  /** Language-ID over raw text. Single-column convenience; inside a
    * projection prefer select(markerCounts as "mc") then
    * langFromCounts($"mc") — see the text_langid query. */
  def predictLang(text: Column): Column = langFromCounts(markerCounts(text))

  /** Normalized-content fingerprint: md5 over lowercased,
    * whitespace-collapsed text (exact-dedup key robust to formatting). */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** PII scrubbing — emails, IPv4 addresses, phone-shaped numbers
    * replaced with typed placeholders. Patterns stay within the regex
    * subset Java and RE2 agree on (char classes, bounded repeats, \b),
    * so results are engine-portable; codegen'd regexp_replace, no UDF.
    * Email first: an address would otherwise leave its dotted host
    * behind for the IP pass. */
  def scrubPii(text: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val phone = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"
    regexp_replace(
      regexp_replace(
        regexp_replace(text, email, "<EMAIL>"),
        ip, "<IP>"),
      phone, "<PHONE>")
  }

  /** Gopher-style repetition / symbol quality signals (Rae et al. 2021
    * §A1.1 use character-fraction variants; these are the token-count
    * analogues, deterministic and engine-portable):
    *
    *  - `top_bigram_frac`  — occurrences of the most frequent word
    *    bigram / total bigrams (boilerplate detector);
    *  - `dup_5gram_frac`   — fraction of 5-gram instances that are
    *    repeats of an earlier 5-gram in the same doc;
    *  - `symbol_ratio`     — non-alphanumeric-non-space chars / tokens;
    *  - `repetition_pass`  — all three under their thresholds
    *    (0.20 / 0.30 / 0.10).
    *
    * The bigram mode is computed by explode → (doc, bigram) count →
    * per-doc max: two keyed aggregations with map-side partial combine,
    * never a per-doc O(n²) array scan — per-doc work stays linear in
    * doc length, so a 100 TB corpus costs two shuffles of the n-gram
    * stream keyed by doc id. The 5-gram duplicate fraction needs no
    * explode at all (array size vs distinct size). */
  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    // Native shingle kernels, not the declarative HOF spelling: the
    // `transform`+`element_at` form runs interpreted (no CSE) and
    // re-splits the text per produced element — it was 20×+ of this
    // query's whole honest cost (docs/PERF.md round 6). Total 5-gram
    // count needs no materialization at all (= max(tokens − 4, 0));
    // the distinct count is one ShingleSet pass; the bigram mode is
    // one ArrayModeCount pass over the ShingleList (duplicates kept)
    // — a per-document statistic needs no cross-row state, so the
    // whole query is ONE scan-projection: the former explode →
    // groupBy(id, bg) → groupBy(id) spelling shuffled rows × bigrams
    // twice and re-joined, for a value every row already knows.
    val toks = split(col(textCol), " ")
    val n5 = greatest(size(toks) - 4, lit(0))
    val frac = (n: Column, d: Column) =>
      when(d > 0, round(n.cast("double") / d.cast("double"), 6))
        .otherwise(lit(0.0))
    df.select(
        col(idCol),
        tokenCount(col(textCol)).as("n_tokens"),
        size(regexp_extract_all(col(textCol),
          lit("[^A-Za-z0-9\\s]"), lit(0))).as("n_symbols"),
        n5.as("n_5grams"),
        (n5 - size(graft.functions.HashExprs.shingleSet(toks, 5)))
          .as("n_dup_5grams"),
        graft.functions.TextExprs.arrayModeCount(
          graft.functions.HashExprs.shingleList(toks, 2)).as("bg"))
      .select(
        col(idCol),
        frac(col("bg.top_count"), col("bg.total")).as("top_bigram_frac"),
        frac(col("n_dup_5grams"), col("n_5grams")).as("dup_5gram_frac"),
        frac(col("n_symbols"), col("n_tokens")).as("symbol_ratio"))
      .withColumn("repetition_pass",
        col("top_bigram_frac") <= 0.20 && col("dup_5gram_frac") <= 0.30 &&
          col("symbol_ratio") <= 0.10)
  }

  /** Per-document salient terms by a tf-idf-shaped score, engine-exact
    * by construction: score = (n_in_doc · (D+1)) / (doc_len · (df+1)),
    * a SINGLE double division of two exact integer products (both far
    * under 2^53), so every engine rounds it identically — unlike
    * log-based idf, where libm ulp differences across engines can flip
    * a rounded 6th decimal. The score is monotone in term frequency and
    * anti-monotone in document frequency, which is all the ranking
    * uses. Ties break on token order. Top `topN` per doc.
    *
    * Shape at scale: the corpus is tokenized ONCE — doc length is the
    * per-doc sum of the (doc,token) counts (a window over the doc-id
    * partition, co-partitioned with the groupBy that produced them, so
    * no extra shuffle and no second text scan); document frequency
    * shuffles on token; the rank window partitions by doc id — every
    * stage is keyed, nothing global. `D` is a driver-side scalar (one
    * count job over ids only, column-pruned). */
  def topTfIdf(df: DataFrame, idCol: String, textCol: String,
      topN: Int = 3): DataFrame = {
    val d = df.count()
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
    // localCheckpoint: both the df-branch and the score-branch consume
    // these rows; without it each branch re-runs the tokenize + explode
    // + groupBy over the whole corpus (no common-subplan reuse across
    // diverging aggregations — verified in the executed plan)
    val perDocTok = df
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("n_in_doc"))
      .withColumn("doc_len", sum(col("n_in_doc")).over(wDoc))
      .localCheckpoint()
    val docFreq = perDocTok.groupBy(col("tok"))
      .agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("score").desc, col("tok"))
    perDocTok
      .join(docFreq, Seq("tok"))
      .withColumn("score",
        round((col("n_in_doc") * lit(d + 1)).cast("double") /
          (col("doc_len") * (col("df") + 1)).cast("double"), 6))
      .withColumn("term_rank", row_number().over(w))
      .filter(col("term_rank") <= topN)
      .select(col(idCol), col("term_rank"), col("tok").as("token"),
        col("score"))
  }

  /** Polynomial rolling hash over tokens (mod 2^31-1, base 131) —
    * an order-sensitive fingerprint, unlike the bag-of-words md5.
    * Computed with exact integer window arithmetic. */
  def rollingHash(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val exploded = df.select(col(idCol),
      posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
    // hash(token) = first 8 hex chars of md5 → int
    val tokHash = conv(substring(md5(col("tok")), 1, 8), 16, 10)
      .cast("long") % 2147483647L
    // rolling = Σ tokHash_i · base^(n-1-i) mod p — via aggregate fold
    exploded
      .withColumn("th", tokHash)
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("pos"), col("th"))))
        .as("ordered"))
      .withColumn("rolling_hash",
        aggregate(col("ordered"), lit(0L),
          (acc, x) => (acc * 131L + x.getField("th")) % 2147483647L))
      .drop("ordered")
  }
}
