package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** tf.Example wire emission: hand-computed byte vector, varint edges,
  * Column-path round trips through codegen, full TFRecord export. */
class TfExampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  private def hex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02x").mkString

  test("known-vector: {id: int64 [5], text: bytes \"hi\"} serializes " +
      "to the hand-derived canonical bytes") {
    val got = TfExample.example(Seq(
      "text" -> TfExample.bytesFeature(Seq("hi".getBytes("UTF-8"))),
      "id" -> TfExample.int64Feature(Seq(5L))))
    // Example{features=1}: 0a 1d
    //  entry(id):   0a 0b [key: 0a 02 "id"] [value: 12 05
    //    Feature{int64_list=3}: 1a 03 [packed: 0a 01 05]]
    //  entry(text): 0a 0e [key: 0a 04 "text"] [value: 12 06
    //    Feature{bytes_list=1}: 0a 04 [frame: 0a 02 "hi"]]
    assert(hex(got) ==
      "0a1d" +
      "0a0b" + "0a026964" + "1205" + "1a03" + "0a0105" +
      "0a0e" + "0a0474657874" + "1206" + "0a04" + "0a026869")
    // feature order in the INPUT must not matter (sorted emission)
    val swapped = TfExample.example(Seq(
      "id" -> TfExample.int64Feature(Seq(5L)),
      "text" -> TfExample.bytesFeature(Seq("hi".getBytes("UTF-8")))))
    assert(java.util.Arrays.equals(got, swapped))
  }

  test("varint edges: boundaries, negatives (10-byte), parse inverse") {
    assert(hex(TfExample.varint(0L)) == "00")
    assert(hex(TfExample.varint(127L)) == "7f")
    assert(hex(TfExample.varint(128L)) == "8001")
    assert(hex(TfExample.varint(300L)) == "ac02") // protobuf spec example
    assert(TfExample.varint(-1L).length == 10)
    val ex = TfExample.example(Seq("v" ->
      TfExample.int64Feature(Seq(-1L, 0L, 127L, 128L, Long.MinValue,
        Long.MaxValue))))
    assert(TfExample.parse(ex)("v") ==
      Seq(-1L, 0L, 127L, 128L, Long.MinValue, Long.MaxValue))
  }

  test("empty lists serialize canonically and parse back empty") {
    val ex = TfExample.example(Seq(
      "b" -> TfExample.bytesFeature(Nil),
      "f" -> TfExample.floatFeature(Nil),
      "i" -> TfExample.int64Feature(Nil)))
    val back = TfExample.parse(ex)
    assert(back.keySet == Set("b", "f", "i"))
    assert(back.values.forall(_.isEmpty))
  }

  test("float features round-trip bit-exactly") {
    val vs = Seq(0.0f, -0.0f, 1.5f, Float.MinPositiveValue,
      Float.MaxValue, Float.NaN)
    val ex = TfExample.example(Seq("f" -> TfExample.floatFeature(vs)))
    val back = TfExample.parse(ex)("f").map(_.asInstanceOf[Float])
    assert(back.map(java.lang.Float.floatToRawIntBits) ==
      vs.map(java.lang.Float.floatToRawIntBits))
  }

  test("nested arrays are rejected at analysis, not per-row in tasks") {
    import spark.implicits._
    val df = Seq((1L, Seq(Seq(1L, 2L)))).toDF("id", "nested")
    val e = intercept[Exception] {
      df.select(TfExample.encode(Seq("nested" -> col("nested"))))
        .collect()
    }
    assert(e.getMessage.contains("TfExampleEncode") ||
      e.getMessage.contains("DATATYPE_MISMATCH"),
      s"want an analysis-time type error, got: ${e.getMessage.take(200)}")
  }

  test("a NULL array ELEMENT fails the task loudly (no silent zero " +
      "stand-in) while a NULL whole value stays an empty feature") {
    import spark.implicits._
    // transform() can introduce containsNull=true arrays — the shape
    // the r15 serializer silently encoded as 0/0.0f/empty bytes
    val df = Seq((1L, Seq(Some(1L), None, Some(3L)))).toDF("id", "xs")
    val e = intercept[Exception] {
      df.select(TfExample.encode(Seq("xs" -> col("xs")))).collect()
    }
    assert(e.getMessage.contains("NULL at list position") ||
      Option(e.getCause).exists(_.getMessage.contains("NULL at list position")),
      s"want the null-element error, got: ${e.getMessage.take(300)}")
    // flat NULL value: legal, encodes the empty feature
    val ok = Seq((1L, null.asInstanceOf[Seq[Long]])).toDF("id", "xs")
      .select(TfExample.encode(Seq("xs" -> col("xs"))).as("pb")).collect()
    val parsed = TfExample.parse(ok.head.getAs[Array[Byte]](0))
    assert(parsed("xs").isEmpty)
  }

  test("Column path (codegen): documents (text, token lengths, id) " +
      "round-trip through encode -> parse") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), col("text"),
        transform(split(col("text"), "\\s+"), t => length(t))
          .cast("array<long>").as("tok_lens"))
    val encoded = docs.select(col("doc_id"),
      TfExample.encode(Seq(
        "text" -> col("text"),
        "tok_lens" -> col("tok_lens"),
        "doc_id" -> col("doc_id"))).as("example"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val want = docs.collect().map { r =>
      (r.getLong(0), r.getString(1), r.getSeq[Long](2))
    }
    assert(encoded.size == want.length)
    want.foreach { case (id, text, lens) =>
      val f = TfExample.parse(encoded(id))
      assert(new String(
        f("text").head.asInstanceOf[Array[Byte]], "UTF-8") == text)
      assert(f("tok_lens") == lens)
      assert(f("doc_id") == Seq(id))
    }
  }

  test("interpreted eval agrees with the codegen path") {
    import org.apache.spark.sql.graftbridge.Bridge
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 20).select(col("doc_id"), col("text"))
    val exprCol = TfExample.encode(Seq(
      "text" -> col("text"), "doc_id" -> col("doc_id")))
    val viaCodegen = docs.select(col("doc_id"), exprCol.as("e"))
      .collect().map(r => r.getLong(0) -> hex(r.getAs[Array[Byte]](1)))
      .toMap
    val viaEval = docs.collect().map { r =>
      val ser = new TfExampleEncode.Serializer(
        Array("text", "doc_id"),
        Array(org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.LongType))
      r.getLong(0) -> hex(ser.serialize(Array(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1)),
        java.lang.Long.valueOf(r.getLong(0)))))
    }.toMap
    assert(viaCodegen == viaEval)
    // silence unused-import style: Bridge is the expression entry point
    assert(Bridge != null)
  }

  test("writeExamples: framed tf.Example shards round-trip and are " +
      "reproducible") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 60).select(col("doc_id"), col("text"))
    val d1 = java.nio.file.Files.createTempDirectory("tfex1").toString
    val d2 = java.nio.file.Files.createTempDirectory("tfex2").toString
    val feats = Seq[(String, org.apache.spark.sql.Column)](
      "text" -> col("text"), "doc_id" -> col("doc_id"))
    val report = TfRecord.writeExamples(docs, "doc_id", feats, d1, 3)
      .collect()
    TfRecord.writeExamples(docs.repartition(7), "doc_id", feats, d2, 3)
      .collect()
    assert(report.map(_.getLong(2)).sum == 60)
    val wantText = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    report.foreach { r =>
      val payloads = TfRecord.readRecords(r.getString(1))
      payloads.foreach { p =>
        val f = TfExample.parse(p)
        val id = f("doc_id").head.asInstanceOf[Long]
        assert(new String(
          f("text").head.asInstanceOf[Array[Byte]], "UTF-8") ==
          wantText(id))
      }
      // bit-reproducible across partitionings
      val twin = r.getString(1).replace(d1, d2)
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(r.getString(1))),
        java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(twin))),
        s"${r.getString(1)} must equal its twin")
    }
  }
}
