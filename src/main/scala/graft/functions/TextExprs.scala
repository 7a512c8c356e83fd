package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text-statistics kernels.
  *
  * The declarative spellings these replace — `size(filter(split(text,
  * ' '), t => t.isin(...)))` per metric — run the lambda INTERPRETED
  * per array element, re-split the text once per metric, and (worse)
  * explode exponentially when folded into an argmax: each `when`
  * level of the language fold references its accumulator twice, so
  * the en-marker filter appears 2^4 times in text_langid's tree. Same
  * pathology as the round-6 text_repetition fix (HashExprs.scala).
  *
  * Both kernels walk the UTF-8 bytes once per row. Tokenization is
  * bit-compatible with `split(text, " ")` (limit -1): segments
  * between single 0x20 bytes, empty segments kept, one empty segment
  * for empty text. Marker/stopword sets are `UTF8String` keys, so
  * segment lookups never materialize java.lang.Strings.
  */
object TextExprs {
  def tokenStats(text: Column, stopwords: Seq[String]): Column =
    Bridge.column(TokenStats(Bridge.expression(text), stopwords))

  def markerCounts(text: Column, markers: Seq[Seq[String]]): Column =
    Bridge.column(MarkerCounts(Bridge.expression(text), markers))

  def arrayModeCount(arr: Column): Column =
    Bridge.column(ArrayModeCount(Bridge.expression(arr)))
}

/** One pass over the text → struct(n_tokens, n_stop, n_distinct,
  * n_chars, n_alpha):
  *  - n_tokens:   size(split(text, ' '))            (empties kept)
  *  - n_stop:     tokens ∈ stopwords
  *  - n_distinct: size(array_distinct(split(...)))  ('' is a token)
  *  - n_chars:    codepoints that are not ' '  ≡ length(regexp_replace
  *                (text, " ", ""))  (UTF-8 lead bytes counted once)
  *  - n_alpha:    ASCII [A-Za-z] bytes ≡ size(regexp_extract_all(text,
  *                '[A-Za-z]'))  (multi-byte codepoints never contain
  *                ASCII-letter bytes, so byte test == regex count)
  */
case class TokenStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false)))

  @transient private lazy val stopSet = {
    val s = new java.util.HashSet[UTF8String](stopwords.size * 2)
    stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val distinct = new java.util.HashSet[UTF8String]()
    var nTok = 0; var nStop = 0; var nChars = 0; var nAlpha = 0
    var segStart = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        nTok += 1
        val seg = UTF8String.fromBytes(bytes, segStart, i - segStart)
        if (stopSet.contains(seg)) nStop += 1
        distinct.add(seg)
        segStart = i + 1
      } else {
        val b = bytes(i)
        if ((b & 0xc0) != 0x80) nChars += 1 // codepoint lead byte
        if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) nAlpha += 1
      }
      i += 1
    }
    InternalRow(nTok, nStop, distinct.size, nChars, nAlpha)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : TokenStats = copy(child = newChild)
}

/** One pass over the text → array<int> of per-marker-list hit counts
  * (markers(i) scores counts(i)). A token may belong to several lists
  * — e.g. 'le' is both a French and a pinyin marker — so the lookup
  * maps token → ALL owning list indices, exactly like one
  * `size(filter(tokens, _.isin(list_i)))` per list. */
case class MarkerCounts(child: Expression, markers: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val index = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    markers.zipWithIndex.foreach { case (words, li) =>
      // per-list dedup: the declarative equivalent (one isin-filter
      // per list) counts a token once no matter how often it appears
      // in the list, so a duplicated marker word must not score twice
      words.distinct.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, if (prev == null) Array(li) else prev :+ li)
      }
    }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val counts = new Array[Int](markers.size)
    var segStart = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        val hit = index.get(
          UTF8String.fromBytes(bytes, segStart, i - segStart))
        if (hit != null) {
          var j = 0
          while (j < hit.length) { counts(hit(j)) += 1; j += 1 }
        }
        segStart = i + 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MarkerCounts = copy(child = newChild)
}

/** Mode statistics of an array<string> in one hash pass →
  * struct(top_count, total): the multiplicity of the most frequent
  * element and the array length. This is the WITHIN-ROW form of
  * `explode → groupBy(id, elem) → groupBy(id, max(c), sum(c))` — the
  * mode of a per-document stream never needs cross-row state, so
  * computing it here deletes both shuffles of the exploded spelling
  * (rows × elements wide). Empty arrays yield (0, 0). */
case class ArrayModeCount(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("top_count", IntegerType, nullable = false),
    StructField("total", IntegerType, nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Int](n * 2)
    var top = 0
    var i = 0
    while (i < n) {
      val k = arr.getUTF8String(i)
      val c = counts.merge(k, 1, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    InternalRow(top, n)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : ArrayModeCount = copy(child = newChild)
}
