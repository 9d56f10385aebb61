package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video payloads as opaque binary with
  * typed metadata, processed per-partition.
  *
  * The Spark-side plumbing — schema, partition-parallel batch iteration,
  * struct metadata, deterministic ids — is real and tested. Two
  * container formats are handled with REAL pure-JVM header parsers
  * (no codec library needed): BMP (BITMAPINFOHEADER) and WAV
  * (RIFF/WAVE PCM), and [[syntheticMedia]] fabricates structurally
  * valid payloads of both so decode is a genuine binary round trip
  * verified by the external oracle. Pixel/audio-sample decoding and
  * compressed formats (jpeg/mp4/...) remain STUBBED with a
  * deterministic fake (this container ships no codecs); those paths
  * are marked `STUB` and swap to a real codec by replacing one
  * function.
  */
object Media {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType), // image | audio | video
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("source", StringType),
      StructField("declared_format", StringType))))))

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("n_bytes", LongType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  // ---- real container builders/parsers (pure JVM, no codec libs) ----------

  private def le16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def le32(b: Array[Byte], off: Int, v: Int): Unit = {
    le16(b, off, v & 0xffff); le16(b, off + 2, (v >>> 16) & 0xffff)
  }
  private def rdLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def rdLe32(b: Array[Byte], off: Int): Int =
    rdLe16(b, off) | (rdLe16(b, off + 2) << 16)

  /** A structurally valid 24bpp BMP (BITMAPFILEHEADER + 40-byte
    * BITMAPINFOHEADER + padded pixel rows; pixel bytes deterministic). */
  def buildBmp(width: Int, height: Int): Array[Byte] = {
    val rowSize = ((width * 3 + 3) / 4) * 4
    val size = 54 + rowSize * height
    val b = new Array[Byte](size)
    b(0) = 'B'; b(1) = 'M'
    le32(b, 2, size); le32(b, 10, 54)
    le32(b, 14, 40); le32(b, 18, width); le32(b, 22, height)
    le16(b, 26, 1); le16(b, 28, 24)
    le32(b, 34, rowSize * height)
    var i = 54
    while (i < size) { b(i) = ((i * 31 + width) & 0xff).toByte; i += 1 }
    b
  }

  /** A structurally valid RIFF/WAVE PCM payload (16-bit mono). */
  def buildWav(sampleRate: Int, nSamples: Int): Array[Byte] = {
    val dataSize = nSamples * 2
    val b = new Array[Byte](44 + dataSize)
    def tag(off: Int, s: String): Unit = s.zipWithIndex.foreach {
      case (c, i) => b(off + i) = c.toByte
    }
    tag(0, "RIFF"); le32(b, 4, 36 + dataSize); tag(8, "WAVE")
    tag(12, "fmt "); le32(b, 16, 16); le16(b, 20, 1); le16(b, 22, 1)
    le32(b, 24, sampleRate); le32(b, 28, sampleRate * 2)
    le16(b, 32, 2); le16(b, 34, 16)
    tag(36, "data"); le32(b, 40, dataSize)
    var i = 44
    while (i < b.length) { b(i) = ((i * 17 + nSamples) & 0xff).toByte; i += 1 }
    b
  }

  /** Real header parse: (format, width, height, duration_ms) for BMP and
    * WAV magic; None for anything else (goes to the STUB path). */
  def parseContainer(payload: Array[Byte]): Option[(String, Int, Int, Long)] = {
    if (payload.length >= 54 && payload(0) == 'B' && payload(1) == 'M')
      Some(("bmp", rdLe32(payload, 18), rdLe32(payload, 22), 0L))
    else if (payload.length >= 44 &&
        new String(payload, 0, 4, "US-ASCII") == "RIFF" &&
        new String(payload, 8, 4, "US-ASCII") == "WAVE") {
      val sampleRate = rdLe32(payload, 24)
      val bytesPerSample = rdLe16(payload, 32)
      val dataSize = rdLe32(payload, 40)
      val nSamples = if (bytesPerSample == 0) 0 else dataSize / bytesPerSample
      Some(("wav", 0, 0, nSamples.toLong * 1000L / sampleRate))
    } else None
  }

  /** STUB codec: deterministic pseudo-decode from a byte-content hash.
    * Replace with a real image/audio decode (??? boundary) in an
    * environment that ships codecs. */
  private def fakeDecode(kind: String, payload: Array[Byte]): (String, Int, Int, Long) = {
    val h = java.util.Arrays.hashCode(payload)
    val fmt = kind match {
      case "image" => if ((h & 1) == 0) "png" else "jpeg"
      case "audio" => if ((h & 1) == 0) "wav" else "flac"
      case _ => "mp4"
    }
    val w = 64 + math.abs(h % 1024)
    val hgt = 64 + math.abs((h / 7) % 1024)
    val dur = if (kind == "image") 0L else 1000L + math.abs(h % 60000).toLong
    (fmt, w, hgt, dur)
  }

  /** Decode/probe stage: per-partition batch iteration over binary
    * payloads (the Scala analogue of a mapInPandas batch UDF) emitting
    * typed metadata. No shuffle — partitioning is preserved. */
  def decode(media: DataFrame): DataFrame = {
    val enc = Encoders.row(decodedSchema)
    media.select("media_id", "kind", "payload").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0); val kind = r.getString(1)
        val payload = r.getAs[Array[Byte]](2)
        // real header parse for recognized containers; STUB for the rest
        val (fmt, w, h, dur) = parseContainer(payload)
          .getOrElse(fakeDecode(kind, payload))
        Row(id, kind, payload.length.toLong, fmt, w, h, dur)
      }
    }(enc)
  }

  /** Feature-extraction stage: fixed-size embedding per payload.
    * STUB: bytes -> deterministic pseudo-embedding; a real model would
    * run here with the identical batch shape. */
  def embed(media: DataFrame, dim: Int = 16): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val enc = Encoders.row(schema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val rng = new scala.util.Random(java.util.Arrays.hashCode(payload).toLong)
        Row(id, Array.fill(dim)(rng.nextFloat()).toSeq)
      }
    }(enc)
  }

  /** Frame-sampling plan for video payloads: one row per sampled frame
    * timestamp (real plumbing; frame pixel extraction is the STUB'd
    * codec's job downstream). */
  def sampleFrames(decoded: DataFrame, everyMs: Long = 1000L): DataFrame =
    decoded.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs))).as("frame_ts_ms"))

  /** Build a media table from any (id, string) source — for tests and
    * demo pipelines (payload = UTF-8 bytes). */
  def fromText(df: DataFrame, idCol: String, textCol: String, kind: String): DataFrame =
    df.select(col(idCol).as("media_id"), lit(kind).as("kind"),
      col(textCol).cast("binary").as("payload"),
      struct(lit("synthetic").as("source"), lit("raw").as("declared_format")).as("meta"))

  /** Structurally VALID synthetic media: even ids get a real BMP, odd
    * ids a real WAV, with dimensions derived only from (id, text length)
    * so an external oracle can recompute the expected metadata without
    * parsing binaries — decode is then a genuine build->parse round
    * trip over the container headers. */
  def syntheticMedia(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val enc = Encoders.row(mediaSchema)
    df.select(col(idCol).cast("long").as("media_id"),
        length(col(textCol)).cast("int").as("n"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0); val n = r.getInt(1)
          val (kind, fmt, payload) =
            if (id % 2 == 0)
              ("image", "bmp", buildBmp(16 + n % 97, 16 + (id % 61).toInt))
            else
              ("audio", "wav", buildWav(8000, 800 + n % 8000))
          Row(id, kind, payload, Row("synthetic", fmt))
        }
      }(enc)
  }
}
