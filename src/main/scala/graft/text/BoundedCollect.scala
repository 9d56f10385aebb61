package graft.text

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `BoundedCollectLong(child, limit)`: collect_list over a BIGINT
  * column whose aggregation state never exceeds `limit` elements —
  * the scale-safe member-list aggregate behind
  * [[TextOps.lshCandidatePairs]]'s single-pass candidate kernel.
  *
  * Contract: for a group with at most `limit` input rows the result is
  * the COMPLETE multiset of values (order unspecified — partial
  * buffers merge in shuffle arrival order); for a bigger group the
  * result is SOME `limit`-subset. Callers that pass
  * `limit = cap + 1` can therefore distinguish "complete list of a
  * small group" (size <= cap) from "truncated list of a hot group"
  * (size = cap + 1) — which is exactly the small-bucket/hot-bucket
  * split, with per-group state bounded at cap + 1 longs no matter how
  * many members a templated mega-bucket has. Spark's own collect_list
  * accumulates the whole group (an executor-OOM at corpus-scale
  * buckets); this is the bounded twin.
  *
  * Nulls are skipped, like collect_list. */
case class BoundedCollectLong(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]]
  with UnaryLike[Expression] {

  require(limit > 0, s"limit must be positive, got $limit")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"BoundedCollectLong requires a bigint input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): ArrayBuffer[Long] =
    new ArrayBuffer[Long](math.min(limit, 16))

  override def update(buf: ArrayBuffer[Long], input: InternalRow): ArrayBuffer[Long] = {
    if (buf.length < limit) {
      val v = child.eval(input)
      if (v != null) buf += v.asInstanceOf[Long]
    }
    buf
  }

  override def merge(b1: ArrayBuffer[Long], b2: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    var i = 0
    while (b1.length < limit && i < b2.length) { b1 += b2(i); i += 1 }
    b1
  }

  override def eval(buf: ArrayBuffer[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: ArrayBuffer[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new ArrayBuffer[Long](n)
    var i = 0
    while (i < n) { buf += bb.getLong(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedCollectLong =
    copy(child = newChild)
}
