package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the engine's custom expressions.
  *
  * Two registration paths:
  *  - config-time: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *    injects the functions into every session of the application;
  *  - runtime: `GraftExtensions.register(spark)` adds them to an
  *    existing session's function registry.
  *
  * After either, plain SQL works:
  *   SELECT fdot(a.embedding, b.embedding) FROM …
  *   SELECT minhash_sig(split(text, ' '), 8, 3) FROM documents
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", name, usage)

  /** Constant-integer argument extraction with proper analysis-time
    * errors (mirroring how Spark built-ins validate constant args): a
    * column reference or non-integral literal gets a descriptive error
    * instead of a ClassCastException/NPE from a blind eval(). Integral
    * widths other than INT (TINYINT/SMALLINT/BIGINT literals like 8L)
    * are accepted and narrowed. */
  private def constInt(fn: String, argName: String, pos: Int,
      e: Expression): Int = {
    def fail(got: String): Nothing = throw new IllegalArgumentException(
      s"[$fn] argument $pos ($argName) must be a constant integer, " +
        s"got $got")
    if (!e.foldable) fail(s"non-constant expression ${e.sql}")
    e.eval() match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case null => fail("NULL")
      case _ => fail(s"${e.dataType.sql} literal ${e.sql}")
    }
  }

  /** Constant array<string> argument extraction, same error contract
    * as [[constInt]]. */
  private def constStrings(fn: String, argName: String, pos: Int,
      e: Expression): Seq[String] = {
    def fail(got: String): Nothing = throw new IllegalArgumentException(
      s"[$fn] argument $pos ($argName) must be a constant array of " +
        s"strings, got $got")
    if (!e.foldable) fail(s"non-constant expression ${e.sql}")
    e.dataType match {
      case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType, _) =>
        e.eval() match {
          case null => fail("NULL")
          case a: org.apache.spark.sql.catalyst.util.ArrayData =>
            (0 until a.numElements()).map { i =>
              if (a.isNullAt(i)) fail("a NULL element")
              else a.getUTF8String(i).toString
            }
        }
      case other => fail(s"${other.sql} expression ${e.sql}")
    }
  }

  /** Constant array<array<string>> argument extraction. */
  private def constStringLists(fn: String, argName: String, pos: Int,
      e: Expression): Seq[Seq[String]] = {
    def fail(got: String): Nothing = throw new IllegalArgumentException(
      s"[$fn] argument $pos ($argName) must be a constant array of " +
        s"string arrays, got $got")
    if (!e.foldable) fail(s"non-constant expression ${e.sql}")
    e.dataType match {
      case org.apache.spark.sql.types.ArrayType(
          inner @ org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType, _), _) =>
        e.eval() match {
          case null => fail("NULL")
          case a: org.apache.spark.sql.catalyst.util.ArrayData =>
            (0 until a.numElements()).map { i =>
              if (a.isNullAt(i)) fail("a NULL list")
              else {
                val in = a.getArray(i)
                (0 until in.numElements()).map { j =>
                  if (in.isNullAt(j)) fail("a NULL element")
                  else in.getUTF8String(j).toString
                }
              }
            }
        }
      case other => fail(s"${other.sql} expression ${e.sql}")
    }
  }

  val definitions: Seq[(String, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    ("fdot",
      info("fdot", "fdot(a, b) - double dot product of two float arrays"),
      (exprs: Seq[Expression]) => FloatDot(exprs(0), exprs(1))),
    ("minhash_sig",
      info("minhash_sig",
        "minhash_sig(tokens, numHashes, k) - MinHash signature over k-shingles"),
      (exprs: Seq[Expression]) => MinHashSig(exprs(0),
        constInt("minhash_sig", "numHashes", 2, exprs(1)),
        constInt("minhash_sig", "k", 3, exprs(2)))),
    ("shingle_set",
      info("shingle_set",
        "shingle_set(tokens, k) - distinct k-token shingles"),
      (exprs: Seq[Expression]) => ShingleSet(exprs(0),
        constInt("shingle_set", "k", 2, exprs(1)))),
    ("rp_buckets",
      info("rp_buckets",
        "rp_buckets(vec, tables, bits) - integer-exact sign-LSH bucket" +
          " ids, one per table"),
      (exprs: Seq[Expression]) => RpBuckets(exprs(0),
        constInt("rp_buckets", "tables", 2, exprs(1)),
        constInt("rp_buckets", "bits", 3, exprs(2)))),
    ("shingle_list",
      info("shingle_list",
        "shingle_list(tokens, k) - all k-token shingles in order," +
          " duplicates kept"),
      (exprs: Seq[Expression]) => ShingleList(exprs(0),
        constInt("shingle_list", "k", 2, exprs(1)))),
    ("token_stats",
      info("token_stats",
        "token_stats(text, stopwords) - struct(n_tokens, n_stop," +
          " n_distinct, n_chars, n_alpha) in one pass over the text"),
      (exprs: Seq[Expression]) => TokenStats(exprs(0),
        constStrings("token_stats", "stopwords", 2, exprs(1)))),
    ("marker_counts",
      info("marker_counts",
        "marker_counts(text, lists) - per-list token hit counts;" +
          " lists is a constant array of string arrays"),
      (exprs: Seq[Expression]) => MarkerCounts(exprs(0),
        constStringLists("marker_counts", "lists", 2, exprs(1)))),
    ("array_mode_count",
      info("array_mode_count",
        "array_mode_count(arr) - struct(top_count, total): multiplicity" +
          " of the most frequent string and the array length"),
      (exprs: Seq[Expression]) => ArrayModeCount(exprs(0))))

  /** Register into an already-running session. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }

  /** Self-check: builds a session WITH the extensions class (the
    * `spark.sql.extensions` startup path) and probes each function
    * from plain SQL. */
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dot = spark.sql(
      "SELECT fdot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT))," +
        " array(CAST(3 AS FLOAT), CAST(4 AS FLOAT)))").head().getDouble(0)
    val sig = spark.sql(
      "SELECT minhash_sig(array('a','b','c','d'), 8, 3)")
      .head().getSeq[String](0)
    val shs = spark.sql("SELECT shingle_set(array('a','b','c','d'), 3)")
      .head().getSeq[String](0)
    val bkts = spark.sql(
      "SELECT rp_buckets(array(CAST(1 AS FLOAT), CAST(-2 AS FLOAT))," +
        " 4, 6)").head().getSeq[Int](0)
    val shl = spark.sql("SELECT shingle_list(array('a','b','a','b'), 2)")
      .head().getSeq[String](0)
    val ts = spark.sql(
      "SELECT token_stats('the cat the', array('the','a'))").head()
      .getStruct(0)
    val mc = spark.sql(
      "SELECT marker_counts('le chat le', " +
        "array(array('the'), array('le','la')))").head().getSeq[Int](0)
    val amc = spark.sql(
      "SELECT array_mode_count(array('x','y','x','x'))").head()
      .getStruct(0)
    println(s"fdot=$dot sig=${sig.length} shingles=$shs buckets=$bkts" +
      s" shingleList=$shl tokenStats=$ts markerCounts=$mc modeCount=$amc")
    assert(dot == 11.0 && sig.length == 8 &&
      shs == Seq("a b c", "b c d") &&
      bkts.length == 4 && bkts.forall(b => b >= 0 && b < 64) &&
      shl == Seq("a b", "b a", "a b") &&
      ts.getInt(0) == 3 && ts.getInt(1) == 2 && ts.getInt(2) == 2 &&
      ts.getInt(3) == 9 && ts.getInt(4) == 9 &&
      mc == Seq(0, 2) &&
      amc.getInt(0) == 3 && amc.getInt(1) == 4)
    println("extensions self-check OK")
    spark.stop()
  }
}
