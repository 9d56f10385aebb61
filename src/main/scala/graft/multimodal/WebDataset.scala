package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType,
  StructField, StructType}

import graft.text.TextOps

/** WebDataset export — the sharded-tar format multimodal training
  * loaders stream (image/caption pairs as `<key>.<ext>` members of
  * `shard-%06d.tar` files, one sequential read per shard): the sink
  * tier that turns a curated (payload, caption) frame into the
  * artifact a training run actually mounts.
  *
  * Split into a PURE manifest plan (oracle-checkable: shard/sequence
  * assignment, member names, member sizes) and a side-effecting writer
  * that consumes it — the same contract split the THERMOCALC sinks
  * use (formatted lines oracled, file IO at the edge).
  */
object WebDataset {

  /** Deterministic export manifest: one row per sample with its shard
    * (the [[graft.text.TextOps.shardAssign]] md5 assignment — salt-free
    * uniform hashing, reproducible across runs and engines), the dense
    * 1-based sequence within the shard, the zero-padded sample key and
    * both member names/sizes. Returns (idCol, shard, seq, key,
    * img_member, txt_member, img_bytes, txt_bytes).
    *
    * Scale shape: [[graft.text.TextOps.shardAssign]]'s one exchange on
    * the shard key + per-shard sequence window (shard size is the unit
    * of parallelism — pick nShards so a shard is a few hundred MB, the
    * WebDataset convention); everything else is a narrow projection.
    * Payload bytes never shuffle for the MANIFEST — only lengths. */
  def manifest(media: DataFrame, idCol: String, payloadCol: String,
      textCol: String, nShards: Int, ext: String = "bmp"): DataFrame = {
    val base = media.select(col(idCol),
      octet_length(col(payloadCol)).cast("long").as("img_bytes"),
      octet_length(col(textCol)).cast("long").as("txt_bytes"))
    val key = lpad(col(idCol).cast("string"), 9, "0")
    TextOps.shardAssign(base, idCol, nShards)
      .select(col(idCol), col("shard"), col("seq"),
        key.as("key"),
        concat(key, lit(s".$ext")).as("img_member"),
        concat(key, lit(".txt")).as("txt_member"),
        col("img_bytes"), col("txt_bytes"))
  }

  /** Write `shard-%06d.tar` USTAR archives under `outDir`, one tar per
    * manifest shard, members in manifest `seq` order (`<key>.<ext>`
    * image bytes then `<key>.txt` caption bytes — the WebDataset
    * same-key-adjacent convention). Pure-JVM USTAR emission (no
    * external tooling): 512-byte headers, octal sizes, correct
    * checksums, two zero blocks at the end — readable by any tar.
    * Returns the per-shard report (shard, path, n_samples,
    * bytes_written) collected from the writing tasks themselves, so a
    * lost task cannot silently under-write an archive.
    *
    * Scale shape: one exchange partitioning samples by shard, a
    * per-shard sort on seq, then each shard streams to its own tar in
    * one pass (payload bytes cross the shuffle once — unavoidable for
    * a sink that must co-locate a shard's members); shards are
    * independent, so the write parallelism is min(nShards, cores). */
  def writeShards(media: DataFrame, idCol: String, payloadCol: String,
      textCol: String, outDir: String, nShards: Int,
      ext: String = "bmp"): DataFrame = {
    val m = manifest(media, idCol, payloadCol, textCol, nShards, ext)
    val rows = media.select(col(idCol),
        col(payloadCol).as("__img"),
        col(textCol).cast("string").as("__txt"))
      .join(m, Seq(idCol))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("seq"))
      .select(col("shard"), col("seq"), col("img_member"),
        col("txt_member"), col("__img"), col("__txt"))
    val schema = StructType(Seq(
      StructField("shard", IntegerType),
      StructField("path", StringType),
      StructField("n_samples", LongType),
      StructField("bytes_written", LongType)))
    val enc = Encoders.row(schema)
    val hc = graft.sources.ShardIO.conf(media)
    val planToken = graft.sources.ShardIO.newPlanToken()
    val report = rows.mapPartitions { it =>
      // a partition may carry several shards (hash partitioning):
      // consume sequentially, cutting a new tar at each shard change —
      // packSequencesAtomic's group-fold pattern. All file IO rides
      // ShardIO's Hadoop-FS temp+rename commit (cluster-portable,
      // retry-safe — see ShardIO's contract).
      var out: java.io.OutputStream = null
      var ss: graft.sources.ShardIO.ShardStream = null
      var cur = Int.MinValue
      var path: String = null
      var n = 0L
      var bytes = 0L
      val done = scala.collection.mutable.ArrayBuffer.empty[Row]
      def close(): Unit = if (out != null) {
        out.write(new Array[Byte](1024)) // end-of-archive zero blocks
        out.close()
        ss.commit()
        done += Row(cur, path, n, bytes + 1024L)
        out = null; ss = null
      }
      def entry(name: String, data: Array[Byte]): Long = {
        val h = new Array[Byte](512)
        val nb = name.getBytes("UTF-8")
        require(nb.length <= 100, s"tar member name too long: $name")
        System.arraycopy(nb, 0, h, 0, nb.length)
        def oct(off: Int, len: Int, v: Long): Unit = {
          val s = java.lang.Long.toOctalString(v)
          val p = "0" * (len - 1 - s.length) + s
          System.arraycopy(p.getBytes("UTF-8"), 0, h, off, len - 1)
        }
        oct(100, 8, 420)            // mode 0644
        oct(108, 8, 0); oct(116, 8, 0)
        oct(124, 12, data.length.toLong)
        oct(136, 12, 0L)            // mtime 0: bit-reproducible shards
        h(156) = '0'                // regular file
        System.arraycopy("ustar".getBytes("UTF-8"), 0, h, 257, 5)
        h(263) = '0'; h(264) = '0' // POSIX magic "ustar\u0000", version "00"
        java.util.Arrays.fill(h, 148, 156, ' '.toByte)
        var sum = 0L
        var i = 0
        while (i < 512) { sum += (h(i) & 0xff); i += 1 }
        oct(148, 7, sum); h(155) = ' '
        out.write(h)
        out.write(data)
        val pad = (512 - data.length % 512) % 512
        if (pad > 0) out.write(new Array[Byte](pad))
        512L + data.length + pad
      }
      val emitted = it.flatMap { r =>
        val sh = r.getInt(0)
        val flushed = if (sh != cur) {
          close()
          if (cur == Int.MinValue) // first write of this task: verify
            graft.sources.ShardIO.requirePrepared(hc, outDir, planToken)
          cur = sh
          path = s"$outDir/shard-${"%06d".format(sh)}.tar"
          ss = graft.sources.ShardIO.begin(hc, path)
          out = new java.io.BufferedOutputStream(ss.raw)
          n = 0L; bytes = 0L
          val f = done.toList; done.clear(); f
        } else Nil
        // null payload → empty member, mirroring the caption guard
        // below (one null row must not fail the whole export task)
        bytes += entry(r.getString(2),
          Option(r.getAs[Array[Byte]](4)).getOrElse(Array.emptyByteArray))
        bytes += entry(r.getString(3),
          Option(r.getString(5)).getOrElse("").getBytes("UTF-8"))
        n += 1
        flushed
      }
      emitted ++ new Iterator[Row] {
        private var flushedTail: List[Row] = null
        override def hasNext: Boolean = {
          if (flushedTail == null) { close(); flushedTail = done.toList }
          flushedTail.nonEmpty
        }
        override def next(): Row = {
          val h = flushedTail.head; flushedTail = flushedTail.tail; h
        }
      }
    }(enc)
    // overwrite semantics at FIRST EXECUTION (not plan build): a plan
    // that is never acted on touches nothing — see ShardIO's contract
    graft.sources.ShardIO.withLazyPrepare(report, hc, outDir, planToken)
  }

  /** JOB-level atomic export: [[writeShards]] + verification + the
    * terminal `_MANIFEST.jsonl` commit
    * ([[graft.sources.ShardIO.commitExport]]). Eager; returns the
    * per-shard report rows. */
  def export(media: DataFrame, idCol: String, payloadCol: String,
      textCol: String, outDir: String, nShards: Int,
      ext: String = "bmp"): Array[Row] =
    graft.sources.ShardIO.commitExport(
      writeShards(media, idCol, payloadCol, textCol, outDir, nShards, ext),
      outDir)

  /** Read a USTAR archive back as (member name, bytes) — the test-side
    * inverse of [[writeShards]]'s emitter (stops at the zero block). */
  def readTar(path: String): Seq[(String, Array[Byte])] = {
    val all = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val outBuf = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    var off = 0
    while (off + 512 <= all.length && all(off) != 0) {
      val name = new String(all, off, 100, "UTF-8").takeWhile(_ != '\u0000')
      val size = java.lang.Long.parseLong(
        new String(all, off + 124, 11, "UTF-8").trim, 8).toInt
      val data = java.util.Arrays.copyOfRange(all, off + 512, off + 512 + size)
      outBuf += ((name, data))
      off += 512 + size + ((512 - size % 512) % 512)
    }
    outBuf.toSeq
  }
}
