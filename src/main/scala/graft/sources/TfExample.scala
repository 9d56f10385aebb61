package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM tf.Example protobuf emission — the payload serializer the
  * [[TfRecord]] sink was missing (its framing is deliberately
  * payload-agnostic; real TF input pipelines expect tf.Example
  * protobufs inside the frames). Wire layout follows the PUBLIC
  * protobuf encoding spec and TensorFlow's example.proto/feature.proto
  * schema:
  *
  *   Example  { Features features = 1 }
  *   Features { map<string, Feature> feature = 1 }
  *   Feature  { oneof { BytesList=1, FloatList=2, Int64List=3 } }
  *   BytesList{ repeated bytes value = 1 }            (one frame each)
  *   FloatList{ repeated float value = 1 [packed] }   (LE 4-byte)
  *   Int64List{ repeated int64 value = 1 [packed] }   (varint)
  *
  * BYTE-DETERMINISTIC by construction: features are emitted in sorted
  * name order, packed lists in element order, varints canonical
  * (minimal length; negatives as 10-byte two's-complement LEB128 per
  * the spec) — so the emitted bytes can be oracled exactly, the same
  * way the TFRecord framing is.
  */
object TfExample {

  /** Canonical unsigned-LEB128 varint of a two's-complement long. */
  def varint(v: Long): Array[Byte] = {
    val buf = new Array[Byte](10)
    var x = v
    var i = 0
    while ((x & ~0x7fL) != 0) {
      buf(i) = ((x & 0x7f) | 0x80).toByte
      x = x >>> 7
      i += 1
    }
    buf(i) = x.toByte
    java.util.Arrays.copyOf(buf, i + 1)
  }

  private def lenDelim(tag: Int, payload: Array[Byte]): Array[Byte] = {
    val t = varint(((tag << 3) | 2).toLong)
    val l = varint(payload.length.toLong)
    val out = new Array[Byte](t.length + l.length + payload.length)
    System.arraycopy(t, 0, out, 0, t.length)
    System.arraycopy(l, 0, out, t.length, l.length)
    System.arraycopy(payload, 0, out, t.length + l.length, payload.length)
    out
  }

  private def cat(parts: Seq[Array[Byte]]): Array[Byte] = {
    val out = new Array[Byte](parts.iterator.map(_.length).sum)
    var off = 0
    parts.foreach { p =>
      System.arraycopy(p, 0, out, off, p.length); off += p.length
    }
    out
  }

  /** Feature carrying a BytesList (one length-framed value each). */
  def bytesFeature(values: Seq[Array[Byte]]): Array[Byte] =
    lenDelim(1, cat(values.map(lenDelim(1, _))))

  /** Feature carrying a packed FloatList (LE 4-byte IEEE-754). An
    * empty list serializes as an empty FloatList message — canonical
    * proto3 omits empty repeated fields. */
  def floatFeature(values: Seq[Float]): Array[Byte] =
    if (values.isEmpty) lenDelim(2, Array.emptyByteArray)
    else {
      val packed = new Array[Byte](4 * values.length)
      values.iterator.zipWithIndex.foreach { case (f, i) =>
        val bits = java.lang.Float.floatToIntBits(f)
        var j = 0
        while (j < 4) {
          packed(4 * i + j) = ((bits >>> (8 * j)) & 0xff).toByte; j += 1
        }
      }
      lenDelim(2, lenDelim(1, packed))
    }

  /** Feature carrying a packed Int64List (canonical varints); empty
    * list -> empty Int64List message. */
  def int64Feature(values: Seq[Long]): Array[Byte] =
    if (values.isEmpty) lenDelim(3, Array.emptyByteArray)
    else lenDelim(3, lenDelim(1, cat(values.map(varint))))

  /** Serialized Example over pre-serialized Features, SORTED by name —
    * the determinism contract (protobuf map order is unspecified;
    * sorted-key emission pins one canonical byte stream). */
  def example(features: Seq[(String, Array[Byte])]): Array[Byte] =
    exampleSorted(features.sortBy(_._1))

  /** [[example]] for callers that already hold the features in sorted
    * name order (the per-row serializer precomputes the permutation —
    * no re-sort on the hot path). */
  private[sources] def exampleSorted(
      features: Seq[(String, Array[Byte])]): Array[Byte] = {
    val entries = features.map { case (name, feat) =>
      lenDelim(1, cat(Seq(
        lenDelim(1, name.getBytes("UTF-8")), lenDelim(2, feat))))
    }
    lenDelim(1, cat(entries))
  }

  /** Minimal test-side parser: Example bytes -> feature name ->
    * decoded list (Seq[Array[Byte]] | Seq[Float] | Seq[Long]).
    * Fail-closed on unknown fields/wire types — a flipped tag or a
    * length mismatch throws instead of yielding garbage. */
  def parse(bytes: Array[Byte]): Map[String, Seq[Any]] = {
    var pos = 0
    def readVarint(): Long = {
      var x = 0L; var shift = 0
      var b = 0
      do {
        b = bytes(pos) & 0xff; pos += 1
        x |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      x
    }
    // read a length-delimited field's tag + length; returns the
    // content's END offset, leaving pos at the content's start
    def enter(wantField: Int): Int = {
      val t = readVarint().toInt
      require(t == ((wantField << 3) | 2),
        s"unexpected tag $t (want field $wantField, wire 2) before $pos")
      val n = readVarint().toInt
      pos + n
    }
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Any]]
    val featuresEnd = enter(1) // Example.features
    while (pos < featuresEnd) {
      val entryEnd = enter(1) // Features.feature map entry
      val keyEnd = enter(1)   // entry.key
      val name = new String(bytes, pos, keyEnd - pos, "UTF-8")
      pos = keyEnd
      val featEnd = enter(2)  // entry.value (Feature)
      if (pos == featEnd) {
        out(name) = Nil // empty Feature message (no oneof set)
      } else {
        val kindTag = readVarint().toInt
        require((kindTag & 7) == 2, s"Feature kind must be a message: $kindTag")
        val listLen = readVarint().toInt
        val listEnd = pos + listLen
        kindTag >> 3 match {
          case 1 => // BytesList: one frame per value
            val vs = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
            while (pos < listEnd) {
              val e = enter(1)
              vs += java.util.Arrays.copyOfRange(bytes, pos, e)
              pos = e
            }
            out(name) = vs.toSeq
          case 2 => // FloatList: packed LE 4-byte
            if (pos == listEnd) out(name) = Nil
            else {
              val e = enter(1)
              val vs = (pos until e by 4).map { o =>
                var bits = 0
                var j = 0
                while (j < 4) {
                  bits |= (bytes(o + j) & 0xff) << (8 * j); j += 1
                }
                java.lang.Float.intBitsToFloat(bits)
              }
              pos = e
              out(name) = vs
            }
          case 3 => // Int64List: packed varints
            if (pos == listEnd) out(name) = Nil
            else {
              val e = enter(1)
              val vs = scala.collection.mutable.ArrayBuffer.empty[Long]
              while (pos < e) vs += readVarint()
              out(name) = vs.toSeq
            }
          case k =>
            throw new IllegalArgumentException(s"unknown Feature kind $k")
        }
        require(pos == listEnd, s"list length mismatch at $pos")
      }
      require(pos == featEnd && featEnd == entryEnd,
        s"feature/entry length mismatch at $pos")
    }
    require(pos == bytes.length, s"trailing bytes after $pos")
    out.toMap
  }

  /** Column form: serialize the given (name, column) features into one
    * BINARY tf.Example per row. Column types map onto Feature kinds:
    * string/binary -> BytesList[1], byte/short/int/long -> Int64List[1],
    * float -> FloatList[1], array of those -> the multi-value list.
    * Null columns contribute an EMPTY list of their kind (the feature
    * stays present, so schemas are stable across rows). */
  def encode(features: Seq[(String, Column)]): Column =
    Bridge.column(TfExampleEncode(
      features.map(f => Bridge.expression(f._2)),
      features.map(_._1)))
}

/** N-ary expression emitting the canonical tf.Example bytes for a row.
  * Codegen-friendly: children evaluate inside whole-stage codegen and
  * the serializer rides along as a reference object. */
case class TfExampleEncode(children: Seq[Expression], names: Seq[String])
    extends Expression {
  require(children.length == names.length && names.nonEmpty,
    "TfExampleEncode needs one name per feature column")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  private def scalarKind(dt: DataType): Either[String, DataType] = dt match {
    case StringType | BinaryType | FloatType => Right(dt)
    case ByteType | ShortType | IntegerType | LongType => Right(LongType)
    case other => Left(other.catalogString)
  }

  // one array level only — tf.Example Features are flat lists, so
  // array<array<...>> must fail at ANALYSIS, not per-row in the task
  private def kindOf(dt: DataType): Either[String, DataType] = dt match {
    case ArrayType(et, _) => scalarKind(et).map(ArrayType(_))
    case other => scalarKind(other)
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = children.zip(names).flatMap { case (c, n) =>
      kindOf(c.dataType).left.toOption.map(t => s"$n: $t")
    }
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"TfExampleEncode cannot serialize ${bad.mkString(", ")} " +
        "(supported: string, binary, integral, float, arrays thereof)")
  }

  @transient private lazy val serializer =
    new TfExampleEncode.Serializer(names.toArray,
      children.map(_.dataType).toArray)

  override def eval(input: InternalRow): Any = {
    val vals = new Array[AnyRef](children.length)
    var i = 0
    while (i < children.length) {
      vals(i) = children(i).eval(input).asInstanceOf[AnyRef]
      i += 1
    }
    serializer.serialize(vals)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.{FalseLiteral,
      JavaCode}
    val ref = ctx.addReferenceObj("tfExampleSer", serializer,
      classOf[TfExampleEncode.Serializer].getName)
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("featVals")
    val assigns = evals.zipWithIndex
      .map { case (e, i) =>
        code"""${e.code}
          $arr[$i] = ${e.isNull} ? null : (Object) ${e.value};"""
      }
      .reduce(_ + _)
    val value = JavaCode.variable(ctx.freshName("tfExample"), BinaryType)
    ev.copy(
      code = code"""Object[] $arr = new Object[${children.length}];
        $assigns
        byte[] $value = $ref.serialize($arr);""",
      isNull = FalseLiteral, value = value)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TfExampleEncode =
    copy(children = newChildren)
}

object TfExampleEncode {
  /** The row serializer: Catalyst values in, canonical Example bytes
    * out. The sorted feature order and each entry's key frame are
    * precomputed ONCE here — the per-row hot path of a 100 TB export
    * must not re-sort names or re-encode keys per record. */
  final class Serializer(names: Array[String], types: Array[DataType])
      extends Serializable {
    // permutation into sorted-name order, fixed at construction
    private val order: Array[Int] =
      names.indices.sortBy(names(_)).toArray
    private val sortedNames: Array[String] = order.map(names)

    def serialize(vals: Array[AnyRef]): Array[Byte] = {
      val feats = new Array[(String, Array[Byte])](order.length)
      var i = 0
      while (i < order.length) {
        val src = order(i)
        feats(i) =
          sortedNames(i) -> featureBytes(sortedNames(i), types(src), vals(src))
        i += 1
      }
      TfExample.exampleSorted(feats)
    }

    private def longsOf(dt: DataType, v: AnyRef): Seq[Long] = dt match {
      case _ if v == null => Nil
      case ByteType => Seq(v.asInstanceOf[java.lang.Byte].longValue)
      case ShortType => Seq(v.asInstanceOf[java.lang.Short].longValue)
      case IntegerType => Seq(v.asInstanceOf[java.lang.Integer].longValue)
      case LongType => Seq(v.asInstanceOf[java.lang.Long].longValue)
      case _ => throw new IllegalStateException(s"not integral: $dt")
    }

    private def featureBytes(name: String, dt: DataType,
        v: AnyRef): Array[Byte] = dt match {
      case StringType =>
        TfExample.bytesFeature(if (v == null) Nil
          else Seq(v.asInstanceOf[UTF8String].getBytes))
      case BinaryType =>
        TfExample.bytesFeature(if (v == null) Nil
          else Seq(v.asInstanceOf[Array[Byte]]))
      case FloatType =>
        TfExample.floatFeature(if (v == null) Nil
          else Seq(v.asInstanceOf[java.lang.Float].floatValue))
      case ByteType | ShortType | IntegerType | LongType =>
        TfExample.int64Feature(longsOf(dt, v))
      case ArrayType(et, _) =>
        if (v == null) featureBytes(name, et, null)
        else {
          val ad = v.asInstanceOf[ArrayData]
          // the tf.Example proto has NO null-element representation: a
          // silent default (0 / 0.0f / empty bytes) would corrupt the
          // payload while still passing reproducibility checks. A flat
          // NULL scalar means "empty feature" (handled above); a null
          // INSIDE a list is a data error — fail the task loudly.
          var j = 0
          while (j < ad.numElements()) {
            if (ad.isNullAt(j)) throw new IllegalArgumentException(
              s"tf.Example feature `$name` has a NULL at list position " +
                s"$j: the proto has no null representation and a zero " +
                "stand-in would silently corrupt the payload. " +
                "filter(x -> x IS NOT NULL) the column first, or make " +
                "the whole value NULL for an empty feature.")
            j += 1
          }
          et match {
            case StringType => TfExample.bytesFeature(
              (0 until ad.numElements()).map(ad.getUTF8String(_).getBytes))
            case BinaryType => TfExample.bytesFeature(
              (0 until ad.numElements()).map(ad.getBinary))
            case FloatType => TfExample.floatFeature(
              (0 until ad.numElements()).map(ad.getFloat))
            case ByteType => TfExample.int64Feature(
              (0 until ad.numElements()).map(ad.getByte(_).toLong))
            case ShortType => TfExample.int64Feature(
              (0 until ad.numElements()).map(ad.getShort(_).toLong))
            case IntegerType => TfExample.int64Feature(
              (0 until ad.numElements()).map(ad.getInt(_).toLong))
            case LongType => TfExample.int64Feature(
              (0 until ad.numElements()).map(ad.getLong))
            case other => throw new IllegalStateException(
              s"unsupported element type $other")
          }
        }
      case other => throw new IllegalStateException(s"unsupported $other")
    }
  }
}
