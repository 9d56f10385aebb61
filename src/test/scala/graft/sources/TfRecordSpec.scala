package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** TFRecord sink: crc-verified round trip, known-vector masked crc32c,
  * shardAssign agreement, fail-closed corruption detection,
  * reproducibility. */
class TfRecordSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("masked crc32c matches the TensorFlow reference vector") {
    // crc32c("123456789") = 0xe3069283 (the canonical CRC-32C check
    // value); TensorFlow's mask: rot15 + 0xa282ead8
    val data = "123456789".getBytes("UTF-8")
    val c = new java.util.zip.CRC32C()
    c.update(data, 0, data.length)
    assert(c.getValue == 0xe3069283L, "JDK CRC32C sanity")
    val crc = 0xe3069283
    val want = (((crc >>> 15) | (crc << 17)) + 0xa282ead8)
    assert(TfRecord.maskedCrc32c(data, 0, data.length) == want)
  }

  test("string records round-trip crc-verified; report matches shardAssign") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 60)
    val out = java.nio.file.Files.createTempDirectory("tfr").toString
    val report = TfRecord.writeShards(docs.select(col("doc_id"),
        col("text")), "doc_id", "text", out, nShards = 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(report.map(_._1).toSet == Set(0, 1, 2, 3))
    assert(report.map(_._3).sum == 60)
    val want = docs.select("text").collect().map(_.getString(0)).toSet
    val got = report.flatMap { case (_, path, nRec, bytes) =>
      assert(java.nio.file.Files.size(java.nio.file.Paths.get(path)) == bytes)
      val recs = TfRecord.readRecords(path)
      assert(recs.size == nRec)
      recs.map(new String(_, "UTF-8"))
    }.toSet
    assert(got == want, "payloads must round-trip exactly")
    // membership equals shardAssign's
    val wantShards = graft.text.TextOps.shardAssign(docs, "doc_id", 4)
      .groupBy("shard").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(report.map(r => r._1 -> r._3).toMap == wantShards)
  }

  test("binary payloads round-trip byte-exactly; corruption fails closed") {
    import spark.implicits._
    val rows = Seq((1L, Array[Byte](0, 1, 2, -1)),
      (2L, Array[Byte]()), (3L, Array[Byte](127)))
      .toDF("doc_id", "payload")
    val out = java.nio.file.Files.createTempDirectory("tfrb").toString
    val report = TfRecord.writeShards(rows, "doc_id", "payload", out, 1)
      .collect()
    assert(report.length == 1 && report.head.getLong(2) == 3)
    val path = report.head.getString(1)
    val back = TfRecord.readRecords(path).map(_.toSeq).toSet
    assert(back == Set(Seq[Byte](0, 1, 2, -1), Seq[Byte](), Seq[Byte](127)))
    // flip one payload byte: the crc-verifying reader must throw
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path))
    bytes(13) = (bytes(13) ^ 0x40).toByte // inside the first payload
    val corrupt = s"$out/corrupt.tfrecord"
    java.nio.file.Files.write(java.nio.file.Paths.get(corrupt), bytes)
    intercept[IllegalArgumentException] { TfRecord.readRecords(corrupt) }
  }

  test("manifest: per-shard record_bytes sums equal committed file " +
      "lengths; seq/shard agree with the written order") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 80).select(col("doc_id"), col("text"))
    val out = java.nio.file.Files.createTempDirectory("tfrm").toString
    val report = TfRecord.writeShards(docs, "doc_id", "text", out, 4)
      .collect().map(r => r.getInt(0) -> (r.getString(1), r.getLong(3)))
      .toMap
    val m = TfRecord.manifest(docs, "doc_id", "text", 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3),
        r.getLong(4)))
    assert(m.length == 80)
    val bySum = m.groupBy(_._2).view.mapValues(_.map(_._5).sum).toMap
    bySum.foreach { case (shard, bytes) =>
      assert(report(shard)._2 == bytes,
        s"shard $shard: manifest $bytes vs written ${report(shard)._2}")
      assert(java.nio.file.Files.size(
        java.nio.file.Paths.get(report(shard)._1)) == bytes)
      assert(report(shard)._1.endsWith(m.find(_._2 == shard).get._4))
    }
    // seq is dense 1..n per shard
    m.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
  }

  test("writeShards is reproducible across runs and partitionings") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < 40).select(col("doc_id"), col("text"))
    val d1 = java.nio.file.Files.createTempDirectory("tfr1").toString
    val d2 = java.nio.file.Files.createTempDirectory("tfr2").toString
    TfRecord.writeShards(docs, "doc_id", "text", d1, 2).collect()
    TfRecord.writeShards(docs.repartition(7), "doc_id", "text", d2, 2)
      .collect()
    (0 until 2).foreach { sh =>
      val p = f"shard-$sh%05d-of-00002.tfrecord"
      val a = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$d1/$p"))
      val b = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$d2/$p"))
      assert(java.util.Arrays.equals(a, b), s"$p must be bit-identical")
    }
  }
}
