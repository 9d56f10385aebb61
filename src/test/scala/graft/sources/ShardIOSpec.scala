package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Shard commit protocol: temp+rename atomicity, stale-temp recovery,
  * twin-attempt race tolerance, scheme-qualified paths — the r15
  * cluster-portability contract for the export tier. */
class ShardIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$dir/documents.parquet")
    .filter(col("doc_id") < 40).select(col("doc_id"), col("text"))

  test("re-run over a partially-written shard (stale temp present) " +
      "commits exactly one bit-correct artifact and no temps remain") {
    val out = Files.createTempDirectory("shardio").toString
    // reference bytes from a clean run elsewhere
    val ref = Files.createTempDirectory("shardio_ref").toString
    TfRecord.writeShards(docs, "doc_id", "text", ref, 2).collect()

    // simulate a crashed attempt: a garbage temp file squatting beside
    // the final name (attempt id it can never reuse)
    Files.createDirectories(Paths.get(out))
    Files.write(Paths.get(s"$out/.shard-00000-of-00002.tfrecord.99999.tmp"),
      Array[Byte](1, 2, 3))
    val report = TfRecord.writeShards(docs, "doc_id", "text", out, 2)
      .collect()
    assert(report.length == 2)
    (0 until 2).foreach { sh =>
      val p = f"shard-$sh%05d-of-00002.tfrecord"
      assert(java.util.Arrays.equals(
        Files.readAllBytes(Paths.get(s"$out/$p")),
        Files.readAllBytes(Paths.get(s"$ref/$p"))),
        s"$p must be bit-identical to the clean run")
    }
    // the writer's own temps are gone (renamed away); only the stale
    // crashed-attempt squatter remains, invisible to shard readers
    // (hidden dot-name, .tmp suffix)
    val leftovers = Files.list(Paths.get(out)).toArray.map(_.toString)
      .filter(_.endsWith(".tmp"))
    assert(leftovers.forall(_.contains("99999")),
      s"no temp from the live run may survive commit: ${leftovers.toSeq}")
  }

  test("re-export over a previous run's output replaces stale shards: " +
      "a shard name the new run does not produce is removed") {
    val out = Files.createTempDirectory("shardio_ow").toString
    // previous run: 4 shards
    TfRecord.writeShards(docs, "doc_id", "text", out, 4).collect()
    assert(Files.exists(Paths.get(s"$out/shard-00003-of-00004.tfrecord")))
    // new run over CHANGED data with 2 shards: prepareDir must clear
    // the old shard files so no stale artifact survives
    val report = TfRecord.writeShards(
      docs.filter(col("doc_id") < 20), "doc_id", "text", out, 2).collect()
    assert(report.length == 2)
    val files = Files.list(Paths.get(out)).toArray.map(_.toString)
      .filter(_.contains("shard-")).sorted
    assert(files.forall(_.contains("-of-00002")),
      s"stale shards must be gone: ${files.toSeq}")
    assert(report.map(_.getLong(2)).sum == 20)
  }

  test("commit race: losing attempt discards its temp, reports the " +
      "committed length, and leaves the winner's bytes intact") {
    val out = Files.createTempDirectory("shardio_race").toString
    val fin = s"$out/shard.bin"
    val hc = ShardIO.conf(docs)
    // winner commits first
    val w = ShardIO.begin(hc, fin)
    w.raw.write(Array[Byte](10, 20, 30));
    assert(w.commit() == 3L)
    // loser wrote identical bytes (reproducibility contract) but must
    // take the dst-exists path: HDFS-style rename-to-existing fails
    // there; on local FS rename overwrites — both end states are the
    // same committed bytes, which is the contract
    val l = ShardIO.begin(hc, fin)
    l.raw.write(Array[Byte](10, 20, 30))
    assert(l.commit() == 3L)
    assert(Files.readAllBytes(Paths.get(fin)).toSeq == Seq[Byte](10, 20, 30))
    assert(Files.list(Paths.get(out)).toArray.map(_.toString)
      .count(_.endsWith(".tmp")) == 0, "no temp survives either attempt")
  }

  test("scheme-qualified file:/ outDir resolves through the Hadoop " +
      "FileSystem and produces the same bytes") {
    val plain = Files.createTempDirectory("shardio_plain").toString
    val schemed = Files.createTempDirectory("shardio_schemed").toString
    Jsonl.writeShards(docs, "doc_id", plain, 2, gzip = false).collect()
    Jsonl.writeShards(docs, "doc_id", s"file:$schemed", 2, gzip = false)
      .collect()
    (0 until 2).foreach { sh =>
      val p = f"shard-$sh%06d.jsonl"
      assert(java.util.Arrays.equals(
        Files.readAllBytes(Paths.get(s"$plain/$p")),
        Files.readAllBytes(Paths.get(s"$schemed/$p"))),
        s"$p must be identical through the schemed path")
    }
  }

  test("executor-side mkdirs: a non-existent nested outDir is created " +
      "by the writing tasks themselves") {
    val base = Files.createTempDirectory("shardio_mk").toString
    val nested = s"$base/a/b/c"
    assert(!Files.exists(Paths.get(nested)))
    val report = Jsonl.writeShards(docs, "doc_id", nested, 2).collect()
    assert(report.length == 2 && Files.exists(Paths.get(nested)))
  }

  test("WebDataset tolerates a null payload row (empty member, not NPE)") {
    import spark.implicits._
    val rows = Seq((1L, Array[Byte](1, 2), "cap one"),
      (2L, null.asInstanceOf[Array[Byte]], "cap two"))
      .toDF("doc_id", "payload", "caption")
    val out = Files.createTempDirectory("shardio_null").toString
    val rep = graft.multimodal.WebDataset.writeShards(
      rows, "doc_id", "payload", "caption", out, 1).collect()
    assert(rep.length == 1 && rep.head.getLong(2) == 2)
    val members = graft.multimodal.WebDataset.readTar(rep.head.getString(1))
    val byName = members.map { case (n, d) => n -> d.length }.toMap
    assert(byName("000000002.bmp") == 0, "null payload → empty member")
    assert(byName("000000001.bmp") == 2)
  }
}
