package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** WebDataset sink: manifest/write agreement, byte-exact tar round
  * trip, same-key-adjacent member order, and reproducibility. */
class WebDatasetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixture(n: Long) = {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < n)
    Media.syntheticPatternBmps(docs, "doc_id")
      .select(col("media_id").as("doc_id"), col("payload"))
      .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
  }

  test("writeShards emits tars whose members round-trip byte-exactly") {
    val media = fixture(60).cache()
    val dir = java.nio.file.Files.createTempDirectory("wds").toString
    val report = WebDataset.writeShards(media, "doc_id", "payload",
        "text", dir, nShards = 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(report.map(_._1).toSet == Set(0, 1, 2, 3), report.toSeq)
    assert(report.map(_._3).sum == 60, "every sample lands in a shard")
    val want = media.collect().map { r =>
      val key = f"${r.getLong(0)}%09d"
      key -> (r.getAs[Array[Byte]](1).toSeq, r.getString(2))
    }.toMap
    val manifest = WebDataset.manifest(media, "doc_id", "payload",
        "text", nShards = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getString(3))).toMap
    report.foreach { case (shard, path, nSamples, bytesWritten) =>
      val members = WebDataset.readTar(path)
      assert(members.size == 2 * nSamples)
      // on-disk size matches the report (report bytes + nothing else)
      assert(java.nio.file.Files.size(java.nio.file.Paths.get(path))
        == bytesWritten)
      // same-key adjacency: image member immediately followed by its txt
      members.grouped(2).foreach { case Seq((img, ib), (txt, tb)) =>
        val key = img.stripSuffix(".bmp")
        assert(txt == s"$key.txt", s"$img / $txt must share a key")
        val (wantImg, wantTxt) = want(key)
        assert(ib.toSeq == wantImg, s"$img bytes must round-trip")
        assert(new String(tb, "UTF-8") == wantTxt, s"$txt must round-trip")
        // the member's shard and order agree with the oracled manifest
        val (mShard, _, mKey) = manifest(key.toLong)
        assert(mShard == shard && mKey == key)
      }
      // members appear in manifest seq order
      val seqs = members.grouped(2).map { case Seq((img, _), _) =>
        manifest(img.stripSuffix(".bmp").toLong)._2
      }.toSeq
      assert(seqs == seqs.sorted, s"shard $shard must be seq-ordered: $seqs")
    }
    media.unpersist()
  }

  test("writeShards is reproducible: two runs emit identical archives") {
    val media = fixture(40)
    val d1 = java.nio.file.Files.createTempDirectory("wds1").toString
    val d2 = java.nio.file.Files.createTempDirectory("wds2").toString
    WebDataset.writeShards(media, "doc_id", "payload", "text", d1, 2).collect()
    WebDataset.writeShards(media.repartition(7), "doc_id", "payload",
      "text", d2, 2).collect()
    (0 until 2).foreach { sh =>
      val p = f"shard-$sh%06d.tar"
      val a = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$d1/$p"))
      val b = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$d2/$p"))
      assert(java.util.Arrays.equals(a, b),
        s"$p must be bit-identical across runs and partitionings")
    }
  }
}
