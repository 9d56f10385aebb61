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
    // NO temps remain: the live run's temps are renamed away and the
    // crashed-attempt squatter was removed by prepareDir at the job's
    // first execution (the r15 assertion here was vacuously true — this
    // pins the intended behavior explicitly)
    val leftovers = Files.list(Paths.get(out)).toArray.map(_.toString)
      .filter(_.endsWith(".tmp"))
    assert(leftovers.isEmpty,
      s"no temp (live or stale) may survive the export: ${leftovers.toSeq}")
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

  test("building a writeShards plan WITHOUT acting on it touches " +
      "nothing (the r15 plan-build destruction, fixed)") {
    val out = Files.createTempDirectory("shardio_lazy").toString
    Jsonl.export(docs, "doc_id", out, 2, gzip = false)
    val before = Files.list(Paths.get(out)).toArray.map(_.toString).sorted
    assert(before.exists(_.endsWith(ShardIO.ManifestName)))
    // build two plans over the same directory; never act on them
    Jsonl.writeShards(docs, "doc_id", out, 4, gzip = false)
    TfRecord.writeShards(docs, "doc_id", "text", out, 3)
    val after = Files.list(Paths.get(out)).toArray.map(_.toString).sorted
    assert(after.toSeq == before.toSeq,
      "an unexecuted plan must not delete the previous good export")
    // and the committed export still verifies end to end
    assert(ShardIO.readCommitted(spark, out).length == 2)
  }

  test("mid-job death is detectably incomplete: shards without the " +
      "terminal manifest fail the reader gate") {
    val out = Files.createTempDirectory("shardio_dead").toString
    // simulate a job that committed all its shards but died BEFORE the
    // terminal manifest commit: plain writeShards action, no export()
    val rep = Jsonl.writeShards(docs, "doc_id", out, 2, gzip = false).collect()
    assert(rep.length == 2, "shards themselves commit fine")
    val e = intercept[IllegalStateException] {
      ShardIO.readCommitted(spark, out)
    }
    assert(e.getMessage.contains("no " + ShardIO.ManifestName),
      s"reader must name the missing manifest: ${e.getMessage}")
  }

  test("a completed export's manifest equals the per-shard aggregation " +
      "of the PURE manifest operator (t147's oracle rows)") {
    val out = Files.createTempDirectory("shardio_complete").toString
    val rep = Jsonl.export(docs, "doc_id", out, 3, gzip = false)
    val committed = ShardIO.readCommitted(spark, out)
    assert(committed.map(_.file) == committed.map(_.file).sorted)
    // the pure manifest's per-shard rollup: n records, sum(line_bytes)
    // + one newline per record == the committed file's exact length
    val want = Jsonl.manifest(docs, "doc_id", 3, gzip = false)
      .groupBy(col("file"))
      .agg(count(lit(1)).as("records"),
        (sum(col("line_bytes")) + count(lit(1))).as("bytes"))
      .collect()
      .map(r => ShardIO.CommittedShard(r.getString(0), r.getLong(1),
        r.getLong(2)))
      .sortBy(_.file).toSeq
    assert(committed == want,
      s"manifest file must equal the pure-operator rollup:\n$committed\nvs\n$want")
    // and the report rows agree with the manifest
    assert(rep.map(r => (new java.io.File(r.getString(1)).getName,
        r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq ==
      committed.map(c => (c.file, c.records, c.bytes)))
  }

  test("a derived action on the report frame AFTER commitExport does " +
      "not destroy the committed manifest (per-plan prepare token)") {
    val out = Files.createTempDirectory("shardio_derived").toString
    val rep = Jsonl.writeShards(docs, "doc_id", out, 2, gzip = false)
    ShardIO.commitExport(rep, out)
    assert(ShardIO.readCommitted(spark, out).length == 2)
    // count() builds a DIFFERENT physical plan over the same frame —
    // a fresh broadcast exchange re-runs the prepare closure, which
    // must recognize its own token and touch nothing
    assert(rep.count() == 2)
    val after = ShardIO.readCommitted(spark, out)
    assert(after.length == 2,
      "the manifest must survive derived actions of the same plan")
  }

  test("post-commit truncation is caught by the reader gate") {
    val out = Files.createTempDirectory("shardio_trunc").toString
    TfRecord.export(docs, "doc_id", "text", out, 2)
    assert(ShardIO.readCommitted(spark, out).length == 2)
    val victim = Files.list(Paths.get(out)).toArray.map(_.toString)
      .filter(_.contains("shard-")).head
    val bytes = Files.readAllBytes(Paths.get(victim))
    Files.write(Paths.get(victim),
      java.util.Arrays.copyOf(bytes, bytes.length - 1))
    val e = intercept[IllegalStateException] {
      ShardIO.readCommitted(spark, out)
    }
    assert(e.getMessage.contains("manifest says"))
  }

  test("re-export replaces the manifest FIRST: an export over a stale " +
      "complete directory can never leave the old manifest lying") {
    val out = Files.createTempDirectory("shardio_remanifest").toString
    Jsonl.export(docs, "doc_id", out, 4, gzip = false)
    val old = ShardIO.readCommitted(spark, out)
    assert(old.length == 4)
    // re-export with different sharding and different membership
    Jsonl.export(docs.filter(col("doc_id") < 20), "doc_id", out, 2,
      gzip = false)
    val now = ShardIO.readCommitted(spark, out)
    assert(now.length == 2 && now.map(_.records).sum == 20)
    // name-prefix filter: Hadoop's LocalFileSystem leaves hidden
    // .shard-*.crc checksum sidecars, which are not shards
    val files = Files.list(Paths.get(out)).toArray
      .map(p => p.asInstanceOf[java.nio.file.Path].getFileName.toString)
      .filter(_.startsWith("shard-"))
    assert(files.length == 2, s"stale shards must be gone: ${files.toSeq}")
  }

  test("WebDataset manifest-vs-tar byte equality: member bytes + USTAR " +
      "overhead == committed tar length, per shard") {
    // the export-tier symmetry: JSONL/TFRecord already pin
    // manifest-sum == file length; this closes it for the tar sink.
    // USTAR member cost = 512 header + data padded to 512; archive
    // tail = two zero blocks (1024).
    val media = docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      substring(col("text"), 1, 37).as("caption"))
    val out = Files.createTempDirectory("shardio_tarbytes").toString
    graft.multimodal.WebDataset.export(
      media, "doc_id", "payload", "caption", out, 2)
    val committed = ShardIO.readCommitted(spark, out)
      .map(c => c.file -> c.bytes).toMap
    def ceil512(x: Long) = ((x + 511) / 512) * 512
    val want = graft.multimodal.WebDataset
      .manifest(media, "doc_id", "payload", "caption", 2)
      .select(col("shard"), col("img_bytes"), col("txt_bytes"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (sh, rs) =>
        val members = rs.map(r =>
          512L + ceil512(r.getLong(1)) + 512L + ceil512(r.getLong(2))).sum
        f"shard-$sh%06d.tar" -> (members + 1024L)
      }
    assert(committed == want,
      s"tar lengths must equal the manifest arithmetic:\n$committed\nvs\n$want")
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

  test("lazy prepare rides a broadcast above the report scan: the " +
      "physical plan carries the nested-loop broadcast join") {
    // The ordering contract withLazyPrepare rests on (broadcast inputs
    // materialize before the stream-side stage launches) is only safe
    // while the prepare closure actually IS on a broadcast side and the
    // optimizer has not eliminated the 1-row crossJoin. Pin the plan
    // shape so a Spark upgrade that rewrites it fails here, not by
    // silently mixing stale shards.
    val out = Files.createTempDirectory("shardio_plan").toString
    val rep = TfRecord.writeShards(docs, "doc_id", "text", out, 2)
    val plan = rep.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"expected the prepare broadcast join in the physical plan:\n$plan")
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastQueryStage"),
      s"expected a broadcast exchange feeding the join:\n$plan")
  }

  test("executor-side prepare verification: requirePrepared passes " +
      "only for the directory's own plan token") {
    val out = Files.createTempDirectory("shardio_marker").toString
    val hc = ShardIO.conf(docs)
    val tok = ShardIO.newPlanToken()
    // unprepared directory (no marker) → fail loudly
    val e1 = intercept[IllegalStateException] {
      ShardIO.requirePrepared(hc, out, tok)
    }
    assert(e1.getMessage.contains("before the output directory"))
    // prepared for THIS plan → pass
    ShardIO.prepareDir(hc, out, tok)
    ShardIO.requirePrepared(hc, out, tok)
    // prepared for a DIFFERENT plan (stale shards may be present) → fail
    val e2 = intercept[IllegalStateException] {
      ShardIO.requirePrepared(hc, out, ShardIO.newPlanToken())
    }
    assert(e2.getMessage.contains("may still hold a previous export"))
  }

  test("the prepare check runs ON THE EXECUTOR and fails the task when " +
      "the directory was prepared for a different plan") {
    // Simulate the feared reorder (a writer task running before this
    // plan's prepareDir) by invoking the writer-side check from inside
    // a real Spark task against a directory another plan prepared: the
    // task must die with the loud diagnosis, proving (a) the Hadoop
    // conf carrier serializes into the task and (b) the failure
    // propagates as a job failure instead of stale-shard mixing.
    val out = Files.createTempDirectory("shardio_defense").toString
    val hc = ShardIO.conf(docs)
    ShardIO.prepareDir(hc, out, ShardIO.newPlanToken()) // someone else's
    val myToken = ShardIO.newPlanToken()
    val e = intercept[org.apache.spark.SparkException] {
      spark.range(2).repartition(2)
        .mapPartitions { it =>
          ShardIO.requirePrepared(hc, out, myToken)
          it.map(_.longValue)
        }(org.apache.spark.sql.Encoders.scalaLong)
        .collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(msgs.contains("may still hold a previous export"),
      s"unexpected failure: $msgs")
  }
}
