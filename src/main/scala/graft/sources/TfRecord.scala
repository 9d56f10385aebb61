package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType,
  StructField, StructType}

/** TFRecord named-shard export — the third artifact format of the
  * export tier (next to [[graft.multimodal.WebDataset]]'s tars and
  * [[Jsonl.writeShards]]'s lines): TensorFlow's framed-record files,
  * `shard-%05d-of-%05d.tfrecord`. The framing is format-agnostic
  * (length + masked crc32c of the length, payload, masked crc32c of
  * the payload — TensorFlow's `io.RecordWriter` layout, crc32c from
  * the JDK's `java.util.zip.CRC32C`), so each record carries whatever
  * bytes the caller serialized — a JSON line, raw image bytes, or a
  * tf.Example protobuf produced upstream.
  *
  * Sharding/order/reproducibility follow the export tier's one
  * contract: [[graft.text.TextOps.shardAssign]] md5 membership,
  * per-shard `seq` order, bit-identical files across runs and
  * partitionings.
  */
object TfRecord {

  /** TensorFlow's masked crc32c: rotate right 15, add the mask delta
    * (uint32 arithmetic). */
  def maskedCrc32c(data: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C()
    c.update(data, off, len)
    val crc = c.getValue.toInt // low 32 bits
    (((crc >>> 15) | (crc << 17)) + 0xa282ead8) // wraps as uint32
  }

  private def le64(v: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    b
  }

  private def le32(v: Int): Array[Byte] = {
    val b = new Array[Byte](4)
    var i = 0
    while (i < 4) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    b
  }

  /** Write one framed record; returns bytes emitted. */
  private def writeRecord(out: java.io.OutputStream,
      payload: Array[Byte]): Long = {
    val len = le64(payload.length.toLong)
    out.write(len)
    out.write(le32(maskedCrc32c(len, 0, 8)))
    out.write(payload)
    out.write(le32(maskedCrc32c(payload, 0, payload.length)))
    16L + payload.length
  }

  /** PURE export manifest for [[writeShards]] — the oracle-checkable
    * half of the sink: one row per record with its shard, dense
    * 1-based per-shard sequence, target file name, and the FRAMED
    * record size (16 bytes of length+crc framing plus the payload) —
    * so `sum(record_bytes)` per shard equals the committed file's
    * byte length exactly (TfRecordSpec pins that equality). */
  def manifest(df: DataFrame, idCol: String, valueCol: String,
      nShards: Int): DataFrame = {
    val isBinary = df.schema(valueCol).dataType ==
      org.apache.spark.sql.types.BinaryType
    val valued = df.select(col(idCol),
      (if (isBinary) col(valueCol)
       else encode(col(valueCol).cast("string"), "UTF-8")).as("__val"))
    graft.text.TextOps.shardAssign(valued, idCol, nShards)
      .select(col(idCol), col("shard"), col("seq"),
        concat(lit("shard-"), lpad(col("shard").cast("string"), 5, "0"),
          lit("-of-"), lpad(lit(nShards).cast("string"), 5, "0"),
          lit(".tfrecord")).as("file"),
        (octet_length(col("__val")) + lit(16)).cast("long")
          .as("record_bytes"))
  }

  /** Deterministic named-shard TFRecord export of a BINARY or STRING
    * value column (strings are UTF-8 encoded): `shard-%05d-of-%05d
    * .tfrecord` under `outDir`, records in [[graft.text.TextOps
    * .shardAssign]] `seq` order. Returns the per-shard report (shard,
    * path, n_records, bytes_written) from the writing tasks; the write
    * happens when the returned frame is acted on.
    *
    * Scale shape: one exchange on the shard key + the per-shard seq
    * window, then each shard streams in one pass — the
    * [[graft.multimodal.WebDataset.writeShards]] fold. */
  def writeShards(df: DataFrame, idCol: String, valueCol: String,
      outDir: String, nShards: Int): DataFrame = {
    val isBinary = df.schema(valueCol).dataType ==
      org.apache.spark.sql.types.BinaryType
    val valued = df.select(col(idCol),
      (if (isBinary) col(valueCol)
       else encode(col(valueCol).cast("string"), "UTF-8")).as("__val"))
    val rows = graft.text.TextOps.shardAssign(valued, idCol, nShards)
      .select(col("shard"), col("seq"), col("__val"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("seq"))
    val schema = StructType(Seq(
      StructField("shard", IntegerType),
      StructField("path", StringType),
      StructField("n_records", LongType),
      StructField("bytes_written", LongType)))
    val enc = Encoders.row(schema)
    val hc = ShardIO.conf(df)
    val planToken = ShardIO.newPlanToken()
    val report = rows.mapPartitions { it =>
      // All file IO rides ShardIO's Hadoop-FS temp+rename commit
      // (cluster-portable, retry-safe — see ShardIO's contract).
      var out: java.io.OutputStream = null
      var ss: ShardIO.ShardStream = null
      var path: String = null
      var cur = Int.MinValue
      var n = 0L
      var bytes = 0L
      val done = scala.collection.mutable.ArrayBuffer.empty[Row]
      def close(): Unit = if (out != null) {
        out.close()
        ss.commit()
        done += Row(cur, path, n, bytes)
        out = null; ss = null
      }
      val emitted = it.flatMap { r =>
        val sh = r.getInt(0)
        val flushed = if (sh != cur) {
          close()
          if (cur == Int.MinValue) // first write of this task: verify
            ShardIO.requirePrepared(hc, outDir, planToken)
          cur = sh
          path = s"$outDir/shard-${"%05d".format(sh)}-of-" +
            s"${"%05d".format(nShards)}.tfrecord"
          ss = ShardIO.begin(hc, path)
          out = new java.io.BufferedOutputStream(ss.raw)
          n = 0L; bytes = 0L
          val f = done.toList; done.clear(); f
        } else Nil
        bytes += writeRecord(out, r.getAs[Array[Byte]](2))
        n += 1
        flushed
      }
      emitted ++ new Iterator[Row] {
        private var tail: List[Row] = null
        override def hasNext: Boolean = {
          if (tail == null) { close(); tail = done.toList }
          tail.nonEmpty
        }
        override def next(): Row = {
          val h = tail.head; tail = tail.tail; h
        }
      }
    }(enc)
    // overwrite semantics at FIRST EXECUTION (not plan build): a plan
    // that is never acted on touches nothing — see ShardIO's contract
    ShardIO.withLazyPrepare(report, hc, outDir, planToken)
  }

  /** JOB-level atomic export: [[writeShards]] + verification + the
    * terminal `_MANIFEST.jsonl` commit ([[ShardIO.commitExport]]).
    * Eager; returns the per-shard report rows. */
  def export(df: DataFrame, idCol: String, valueCol: String,
      outDir: String, nShards: Int): Array[Row] =
    ShardIO.commitExport(
      writeShards(df, idCol, valueCol, outDir, nShards), outDir)

  /** JOB-level atomic [[writeExamples]] — same terminal-manifest
    * commit as [[export]]. */
  def exportExamples(df: DataFrame, idCol: String,
      features: Seq[(String, org.apache.spark.sql.Column)],
      outDir: String, nShards: Int): Array[Row] =
    ShardIO.commitExport(
      writeExamples(df, idCol, features, outDir, nShards), outDir)

  /** TFRecord export whose payloads are canonical [[TfExample]]
    * protobufs serialized from the given (name, column) features —
    * the full TF input-pipeline artifact (tf.data's
    * `TFRecordDataset` + `parse_single_example` consume these
    * directly). Same sharding/order/reproducibility contract as
    * [[writeShards]]; the serialization is a codegen'd projection
    * ahead of the shard exchange, so payload bytes shuffle once. */
  def writeExamples(df: DataFrame, idCol: String,
      features: Seq[(String, org.apache.spark.sql.Column)],
      outDir: String, nShards: Int): DataFrame =
    writeShards(
      df.select(col(idCol), TfExample.encode(features).as("__example")),
      idCol, "__example", outDir, nShards)

  /** Read a TFRecord file back as payload byte arrays, VERIFYING both
    * masked crc32c fields per record — the test-side inverse of
    * [[writeShards]], and fail-closed: a flipped bit anywhere in the
    * framing or payload throws instead of yielding garbage. */
  def readRecords(path: String): Seq[Array[Byte]] = {
    val all = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val outBuf = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var off = 0
    def le32At(o: Int): Int =
      (all(o) & 0xff) | ((all(o + 1) & 0xff) << 8) |
        ((all(o + 2) & 0xff) << 16) | ((all(o + 3) & 0xff) << 24)
    while (off < all.length) {
      require(maskedCrc32c(all, off, 8) == le32At(off + 8),
        s"length crc mismatch at offset $off in $path")
      var len = 0L
      var i = 0
      while (i < 8) { len |= (all(off + i) & 0xffL) << (8 * i); i += 1 }
      val n = len.toInt
      val payload = java.util.Arrays.copyOfRange(all, off + 12, off + 12 + n)
      require(maskedCrc32c(payload, 0, n) == le32At(off + 12 + n),
        s"payload crc mismatch at offset $off in $path")
      outBuf += payload
      off += 16 + n
    }
    outBuf.toSeq
  }
}
