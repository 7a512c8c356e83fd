package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature kernel.
  *
  * Semantics (shared with the DuckDB oracle, see queries.Pipeline):
  * for each shingle s, m = md5hex(s) ‖ md5hex(reverse(s)) (64 hex
  * chars); permutation value p = m[8p .. 8p+8); signature[p] = min over
  * shingles. Declaratively this is an `aggregate(zip_with(...))` fold —
  * correct but interpreted per element; this expression runs the same
  * fold as a tight JVM loop with one MessageDigest per task.
  *
  * numHashes > 8 (up to 16) appends a second 64-hex block
  * m' = md5hex(s ‖ '#') ‖ md5hex('#' ‖ s), so slices 8..15 come from
  * independent digests; the first 8 slices are byte-identical to the
  * numHashes ≤ 8 signature (existing oracles depend on that prefix
  * stability). '#' never occurs inside a shingle (tokens are
  * whitespace-split words joined by single spaces), so the padded
  * strings cannot collide with any unpadded shingle.
  *
  * NB: `reverse` is by UTF-16 code unit here and by codepoint in some
  * engines — identical on ASCII text; normalize first for full unicode.
  */
case class MinHashSig(child: Expression, numHashes: Int, shingleK: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, false)

  @transient private lazy val digest =
    java.security.MessageDigest.getInstance("MD5")

  private def md5hex(s: String): String = {
    val bytes = digest.digest(s.getBytes("UTF-8"))
    digest.reset()
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < bytes.length) {
      sb.append(Character.forDigit((bytes(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(bytes(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** Input: token array. Shingles (k consecutive tokens joined by one
    * space) are built inside the loop — no intermediate array rows. */
  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val mins = Array.fill[String](numHashes)("~") // '~' > any hex char
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= n - shingleK) {
      sb.setLength(0)
      var j = 0
      while (j < shingleK) {
        if (j > 0) sb.append(' ')
        sb.append(toks.getUTF8String(i + j).toString)
        j += 1
      }
      val s = sb.toString
      val rev = new java.lang.StringBuilder(s).reverse.toString
      val m =
        if (numHashes <= 8) md5hex(s) + md5hex(rev)
        else md5hex(s) + md5hex(rev) + md5hex(s + "#") + md5hex("#" + s)
      var p = 0
      while (p < numHashes) {
        val slice = m.substring(p * 8, p * 8 + 8)
        if (slice.compareTo(mins(p)) < 0) mins(p) = slice
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromString(_)))
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashSig = copy(child = newChild)
}

/** Native k-token shingle set (distinct, order of first occurrence is
  * irrelevant to consumers — comparisons are set ops). */
case class ShingleSet(child: Expression, shingleK: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, false)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= n - shingleK) {
      sb.setLength(0)
      var j = 0
      while (j < shingleK) {
        if (j > 0) sb.append(' ')
        sb.append(toks.getUTF8String(i + j).toString)
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[AnyRef](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : ShingleSet = copy(child = newChild)
}

/** Native k-token shingle LIST — every shingle in order, duplicates
  * kept (the multiset [[ShingleSet]] deliberately collapses). Consumers
  * that count repeats (repetition gates' bigram mode) need this one;
  * the declarative HOF spelling (`transform` + `element_at`) evaluates
  * interpreted with no CSE, re-splitting the text per produced element
  * — measured 20×+ slower on real documents (docs/PERF.md round 6). */
case class ShingleList(child: Expression, shingleK: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, false)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val m = math.max(n - shingleK + 1, 0)
    val out = new Array[AnyRef](m)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < shingleK) {
        if (j > 0) sb.append(' ')
        sb.append(toks.getUTF8String(i + j).toString)
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : ShingleList = copy(child = newChild)
}

object HashExprs {
  /** MinHash signature column over an array<string> TOKEN column. */
  def minhashSig(tokens: Column, numHashes: Int, shingleK: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(tokens), numHashes,
      shingleK))

  /** Distinct k-shingle set over an array<string> token column. */
  def shingleSet(tokens: Column, shingleK: Int): Column =
    Bridge.column(ShingleSet(Bridge.expression(tokens), shingleK))

  /** All k-shingles in order (duplicates kept) over a token column. */
  def shingleList(tokens: Column, shingleK: Int): Column =
    Bridge.column(ShingleList(Bridge.expression(tokens), shingleK))
}
