package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded-memory per-group top-K selection as a native
  * [[TypedImperativeAggregate]] — the scale-safe alternative to
  * `row_number().over(Window.partitionBy(g).orderBy(p)) <= K`.
  *
  * The window form must SORT AND MATERIALIZE every group's full row
  * set in the window operator before ranking (per-partition sort +
  * buffering of the largest group in memory/spill); this aggregate
  * keeps exactly K entries per group in a bounded heap, composes
  * map-side partials (each task ships ≤K entries per group, not the
  * group), and never sorts more than K elements at eval. At 100 TB
  * with quota K and billions of rows per hot group, the window form
  * spills; this is O(K) state per group by construction — the same
  * mergeable-summaries execution shape as [[Sketch.MisraGriesAgg]].
  *
  * Ordering is (priority ASC, id ASC) over a string priority and a
  * long id; UTF8String.compareTo is byte-lexicographic, which for
  * ASCII priorities (md5 hex in source_cap_agg) equals both engines'
  * SQL string ORDER BY, so results are engine-identical.
  */
object TopK {

  /** Mutable bounded selection: a size-≤K max-heap keyed by
    * (priority, id); a new element displaces the current maximum iff
    * it sorts strictly below it. */
  final class TopKState(val entries: java.util.PriorityQueue[TopKState.Entry])

  object TopKState {
    final class Entry(val pri: UTF8String, val id: Long)

    /** Max-heap order: largest (pri, id) at the head for O(log K)
      * displacement. */
    private val maxFirst = new java.util.Comparator[Entry] {
      override def compare(a: Entry, b: Entry): Int = {
        val c = b.pri.compareTo(a.pri)
        if (c != 0) c else java.lang.Long.compare(b.id, a.id)
      }
    }

    def empty(): TopKState =
      new TopKState(new java.util.PriorityQueue[Entry](maxFirst))

    private def less(p1: UTF8String, i1: Long, e: Entry): Boolean = {
      val c = p1.compareTo(e.pri)
      c < 0 || (c == 0 && i1 < e.id)
    }

    /** `pri` may be backed by transient task memory; cloned only when
      * actually admitted (the [[Sketch.MGState.add]] contract). */
    def add(st: TopKState, pri: UTF8String, id: Long, k: Int): Unit =
      if (st.entries.size < k) st.entries.add(new Entry(pri.clone(), id))
      else if (less(pri, id, st.entries.peek())) {
        st.entries.poll()
        st.entries.add(new Entry(pri.clone(), id))
      }

    /** Entries from `from` are heap-owned (they only arrive via
      * deserialize), so no clone on merge — same ownership invariant
      * as [[Sketch.MGState.merge]]. */
    def merge(into: TopKState, from: TopKState, k: Int): TopKState = {
      val it = from.entries.iterator()
      while (it.hasNext) {
        val e = it.next()
        if (into.entries.size < k) into.entries.add(e)
        else if (less(e.pri, e.id, into.entries.peek())) {
          into.entries.poll()
          into.entries.add(e)
        }
      }
      into
    }
  }

  /** Catalyst aggregate: evaluates to
    * array<struct<pri string, id bigint>> sorted (pri ASC, id ASC). */
  case class TopKAgg(left: Expression, right: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[TopK.TopKState]
      with BinaryLike[Expression] {
    require(k > 0)

    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("pri", StringType, nullable = false),
      StructField("id", LongType, nullable = false))),
      containsNull = false)

    override def createAggregationBuffer(): TopKState = TopKState.empty()

    override def update(buffer: TopKState, input: InternalRow)
        : TopKState = {
      val p = left.eval(input)
      val i = right.eval(input)
      if (p != null && i != null)
        TopKState.add(buffer, p.asInstanceOf[UTF8String],
          i.asInstanceOf[Long], k)
      buffer
    }

    override def merge(buffer: TopKState, other: TopKState): TopKState =
      TopKState.merge(buffer, other, k)

    override def eval(buffer: TopKState): Any = {
      val arr = buffer.entries.toArray(
        new Array[TopKState.Entry](buffer.entries.size))
      java.util.Arrays.sort(arr, new java.util.Comparator[TopKState.Entry] {
        override def compare(a: TopKState.Entry, b: TopKState.Entry)
            : Int = {
          val c = a.pri.compareTo(b.pri)
          if (c != 0) c else java.lang.Long.compare(a.id, b.id)
        }
      })
      new GenericArrayData(
        arr.map(e => InternalRow(e.pri, e.id): Any))
    }

    // Length-prefixed binary layout: #entries, then
    // (priLen, priBytes, id) per entry — the Sketch serializer shape.
    override def serialize(buffer: TopKState): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream(16 + 48 *
        buffer.entries.size)
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(buffer.entries.size)
      val it = buffer.entries.iterator()
      while (it.hasNext) {
        val e = it.next()
        val pb = e.pri.getBytes
        out.writeInt(pb.length)
        out.write(pb)
        out.writeLong(e.id)
      }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): TopKState = {
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val st = TopKState.empty()
      var remaining = in.readInt()
      while (remaining > 0) {
        val pb = new Array[Byte](in.readInt())
        in.readFully(pb)
        st.entries.add(new TopKState.Entry(
          UTF8String.fromBytes(pb), in.readLong()))
        remaining -= 1
      }
      st
    }

    override def defaultResult: Option[Literal] = None
    override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): TopKAgg =
      copy(left = newLeft, right = newRight)
  }

  /** Top-K column: array<struct<pri,id>> of the K smallest
    * (priority, id) pairs in the group, ascending. */
  def topK(pri: Column, id: Column, k: Int): Column =
    Bridge.column(TopKAgg(Bridge.expression(pri),
      Bridge.expression(id), k).toAggregateExpression())
}
