package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequency sketches for vocabulary-scale corpora.
  *
  * The naive "top tokens" query — explode → groupBy(token) → count →
  * top-k — shuffles one row per DISTINCT token. At 100 TB the token
  * vocabulary is billions of strings, most of which occur once; the
  * shuffle is dominated by junk that can never be frequent. The
  * Misra–Gries summary bounds the state to k counters PER PARTIAL
  * BUFFER: each executor folds its partition into ≤k counters map-side
  * and only those sketches are merged (mergeable-summaries semantics,
  * Agarwal et al., PODS'12), so shuffled bytes are O(k × partitions)
  * regardless of vocabulary size.
  *
  * Guarantee: every item with true frequency > N/(k+1) is in the final
  * candidate set (decrements can only subtract N/(k+1) total from any
  * item). [[Sketch.heavyHitters]] therefore recounts the ≤k candidates
  * EXACTLY in a second filtered scan and emits precisely the tokens with
  * count·(k+1) > N — a deterministic, sketch-error-free result that an
  * exact SQL oracle can reproduce.
  *
  * Implemented as a native [[TypedImperativeAggregate]] (the same shape
  * Spark uses for approx_percentile / HLL++): the per-partition buffer
  * is a mutable hash map updated in place — no per-row immutable-Map
  * allocation — keyed by [[UTF8String]] so hot-path lookups never
  * convert to java.lang.String, and (de)serialized with a hand-rolled
  * length-prefixed byte format instead of Kryo. Serialization only
  * happens at partial-output / spill boundaries, so its cost is
  * O(k × partitions) total.
  */
object Sketch {

  /** Mutable Misra–Gries summary: ≤k counters + items-processed. */
  final class MGState(var n: Long,
      val counters: java.util.HashMap[UTF8String, MGState.Counter])

  object MGState {
    /** Mutable count cell — increment without re-boxing a Long. */
    final class Counter(var value: Long)

    def empty(): MGState = new MGState(0L, new java.util.HashMap)

    /** Streaming update. When the summary is full and `tok` is absent,
      * every counter is decremented (zeros evicted) and `tok` is NOT
      * admitted — the classic MG step; any item loses at most N/(k+1)
      * total, which is the survival guarantee heavyHitters relies on.
      *
      * `tok` may be backed by transient task memory (an UnsafeRow
      * page); it is defensively copied ONLY when actually stored. */
    def add(st: MGState, tok: UTF8String, k: Int): Unit = {
      st.n += 1L
      val hit = st.counters.get(tok)
      if (hit != null) hit.value += 1L
      else if (st.counters.size < k) st.counters.put(tok.clone(),
        new Counter(1L))
      else {
        val it = st.counters.values().iterator()
        while (it.hasNext) {
          val c = it.next()
          if (c.value == 1L) it.remove() else c.value -= 1L
        }
      }
    }

    /** Merge `from` into `into` (mutating `into`): sum counters, then
      * if more than k survive subtract the (k+1)-th largest count from
      * everything — the merged-summary analogue of the streaming
      * decrement (Agarwal et al., PODS'12, mergeable summaries).
      *
      * OWNERSHIP INVARIANT: `from` keys are stored into `into` WITHOUT
      * cloning. That is safe only because every `from` buffer reaching
      * a [[TypedImperativeAggregate.merge]] comes from `deserialize()`
      * (heap-owned byte arrays), and `add` already clones before
      * admitting a page-backed input UTF8String. If this merge is ever
      * reused outside that contract, clone `e.getKey` on insert. */
    def merge(into: MGState, from: MGState, k: Int): MGState = {
      val it = from.counters.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cur = into.counters.get(e.getKey)
        if (cur != null) cur.value += e.getValue.value
        else into.counters.put(e.getKey, new Counter(e.getValue.value))
      }
      if (into.counters.size > k) {
        val vals = new Array[Long](into.counters.size)
        var i = 0
        val vi = into.counters.values().iterator()
        while (vi.hasNext) { vals(i) = vi.next().value; i += 1 }
        java.util.Arrays.sort(vals)
        val cut = vals(vals.length - 1 - k) // (k+1)-th largest
        val del = into.counters.entrySet().iterator()
        while (del.hasNext) {
          val e = del.next()
          if (e.getValue.value <= cut) del.remove()
          else e.getValue.value -= cut
        }
      }
      into.n += from.n
      into
    }

    /** Immutable view for tests / driver consumption. */
    def toMap(st: MGState): Map[String, Long] = {
      val b = Map.newBuilder[String, Long]
      val it = st.counters.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        b += e.getKey.toString -> e.getValue.value
      }
      b.result()
    }
  }

  /** Catalyst Misra–Gries aggregate: evaluates to
    * struct(candidates map<string,bigint>, n bigint). */
  case class MisraGriesAgg(child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[MGState] with UnaryLike[Expression]
      with ExpectsInputTypes {
    require(k > 0)

    // Non-string children fail at ANALYSIS time (the ApproximatePercentile
    // pattern), not with a ClassCastException inside update(). Return type
    // inferred: AbstractDataType is private[sql] and cannot be named here.
    override def inputTypes = Seq(StringType)
    override def nullable: Boolean = false
    override def dataType: DataType = StructType(Seq(
      StructField("candidates",
        MapType(StringType, LongType, valueContainsNull = false),
        nullable = false),
      StructField("n", LongType, nullable = false)))

    override def createAggregationBuffer(): MGState = MGState.empty()

    override def update(buffer: MGState, input: InternalRow): MGState = {
      val v = child.eval(input)
      if (v != null) MGState.add(buffer, v.asInstanceOf[UTF8String], k)
      buffer
    }

    override def merge(buffer: MGState, other: MGState): MGState =
      MGState.merge(buffer, other, k)

    override def eval(buffer: MGState): Any = {
      val size = buffer.counters.size
      val keys = new Array[Any](size)
      val vals = new Array[Any](size)
      var i = 0
      val it = buffer.counters.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        keys(i) = e.getKey
        vals(i) = e.getValue.value
        i += 1
      }
      InternalRow(new ArrayBasedMapData(
        new GenericArrayData(keys), new GenericArrayData(vals)), buffer.n)
    }

    // Length-prefixed binary layout: n, #entries, then
    // (keyLen, keyBytes, count) per entry. No object graphs, no Kryo.
    override def serialize(buffer: MGState): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream(64 + 24 *
        buffer.counters.size)
      val out = new java.io.DataOutputStream(bos)
      out.writeLong(buffer.n)
      out.writeInt(buffer.counters.size)
      val it = buffer.counters.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val kb = e.getKey.getBytes
        out.writeInt(kb.length)
        out.write(kb)
        out.writeLong(e.getValue.value)
      }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): MGState = {
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val st = new MGState(in.readLong(), new java.util.HashMap)
      var remaining = in.readInt()
      while (remaining > 0) {
        val kb = new Array[Byte](in.readInt())
        in.readFully(kb)
        st.counters.put(UTF8String.fromBytes(kb),
          new MGState.Counter(in.readLong()))
        remaining -= 1
      }
      st
    }

    override def defaultResult: Option[Literal] = None
    override def withNewMutableAggBufferOffset(newOffset: Int)
        : MisraGriesAgg = copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int)
        : MisraGriesAgg = copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression)
        : MisraGriesAgg = copy(child = newChild)
  }

  /** Misra–Gries sketch column over a string column:
    * struct(candidates, n). */
  def misraGries(tok: Column, k: Int): Column =
    Bridge.column(MisraGriesAgg(Bridge.expression(tok), k)
      .toAggregateExpression())

  /** Exact heavy hitters via sketch-then-recount: tokens of `textCol`
    * whose corpus frequency exceeds N/(k+1), with EXACT counts.
    * Pass 1 is the Misra–Gries all-reduce (driver receives ≤k
    * candidates — bounded, like the IVF centroid collect); pass 2
    * recounts only candidate tokens (an `isin` literal filter pushed
    * into the scan) and applies the exact integer threshold
    * `count · (k+1) > N`. */
  def heavyHitters(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val toks = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val sk = toks.select(misraGries(col("tok"), k).as("mg"))
      .head().getStruct(0)
    val candidates = sk.getAs[Map[String, Long]]("candidates").keys
      .toSeq.sorted
    val n = sk.getAs[Long]("n")
    toks
      .filter(col("tok").isin(candidates: _*))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") * (k + 1) > n)
      .select(col("tok").as("token"), col("n_occurrences"))
  }
}
