package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded-k smallest-rows aggregate — the TRULY skew-flat exact top-k
  * building block: per-group state is a k-bounded heap that combines
  * MAP-SIDE, so a group holding the whole corpus reduces to one k-row
  * partial per map task before it ever shuffles. This is the structure
  * a `Window.partitionBy(group).orderBy(...) + rank <= k` funnels
  * through one task, and that even a salted two-stage window only
  * improves by a constant factor — the heap's max-task is O(input
  * partition), independent of the group histogram.
  *
  * Semantics: collects the k SMALLEST values of `child` (any orderable
  * Catalyst type — use a struct to encode a multi-column comparator,
  * e.g. `struct(-key, id)` for (key desc, id asc)), returned as an
  * array SORTED ascending. Deterministic for total orders (give the
  * struct a unique tiebreaker). Same algebra as Spark's internal
  * `CollectTopK` (which is `private[aggregate]`), reimplemented on the
  * public TypedImperativeAggregate contract.
  */
case class TopKRows(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.PriorityQueue[Any]] {
  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, false)

  override def checkInputDataTypes(): TypeCheckResult =
    Bridge.checkOrderable(child.dataType, "topk_rows")

  // max-heap of the k smallest seen: the ROOT is the current worst,
  // evicted when a smaller value arrives
  @transient private lazy val ord: Ordering[Any] =
    Bridge.interpretedOrdering(child.dataType)

  override def createAggregationBuffer()
      : scala.collection.mutable.PriorityQueue[Any] =
    new scala.collection.mutable.PriorityQueue[Any]()(ord)

  private def push(buf: scala.collection.mutable.PriorityQueue[Any],
      v: Any): Unit = {
    if (buf.size < k) buf.enqueue(v)
    else if (ord.lt(v, buf.head)) { buf.dequeue(); buf.enqueue(v) }
  }

  override def update(buf: scala.collection.mutable.PriorityQueue[Any],
      input: InternalRow): scala.collection.mutable.PriorityQueue[Any] = {
    val v = child.eval(input)
    if (v != null) {
      // COPY every buffer-backed value (InternalRow, UTF8String,
      // ArrayData, MapData) — the aggregate's input rows are REUSED,
      // so a retained pointer silently mutates; InternalRow.copyValue
      // is Spark's own deep-copy dispatch for exactly this
      push(buf, InternalRow.copyValue(v))
    }
    buf
  }

  override def merge(buf: scala.collection.mutable.PriorityQueue[Any],
      other: scala.collection.mutable.PriorityQueue[Any])
      : scala.collection.mutable.PriorityQueue[Any] = {
    other.foreach(push(buf, _))
    buf
  }

  override def eval(
      buf: scala.collection.mutable.PriorityQueue[Any]): Any =
    new GenericArrayData(buf.toArray.sorted(ord))

  @transient private lazy val proj = child.dataType match {
    case st: StructType => UnsafeProjection.create(st)
    case dt => UnsafeProjection.create(Array(dt))
  }

  override def serialize(
      buf: scala.collection.mutable.PriorityQueue[Any]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(buf.size)
    val isStruct = child.dataType.isInstanceOf[StructType]
    val wbuf = new Array[Byte](4096)
    buf.foreach { v =>
      val ur = if (isStruct) proj(v.asInstanceOf[InternalRow])
        else proj(InternalRow(v))
      dos.writeInt(ur.getSizeInBytes)
      ur.writeToStream(dos, wbuf)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(
      bytes: Array[Byte]): scala.collection.mutable.PriorityQueue[Any] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    val isStruct = child.dataType.isInstanceOf[StructType]
    val nFields = child.dataType match {
      case st: StructType => st.size
      case _ => 1
    }
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      val ur = new UnsafeRow(nFields)
      ur.pointTo(arr, len)
      val v = if (isStruct) ur.copy()
        else ur.copy().get(0, child.dataType)
      push(buf, v)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRows =
    copy(child = newChildren.head)
}

object TopK {
  /** Column form: `topKRows(struct(...), k)` — array of the k smallest
    * values, sorted ascending. */
  def topKRows(c: Column, k: Int): Column =
    Bridge.column(TopKRows(Bridge.expression(c), k)
      .toAggregateExpression())
}
