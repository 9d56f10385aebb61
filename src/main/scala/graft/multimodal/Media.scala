package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video payloads as opaque binary with
  * typed metadata, processed per-partition.
  *
  * The Spark-side plumbing — schema, partition-parallel batch iteration,
  * struct metadata, deterministic ids — is real and tested. The actual
  * codec work is STUBBED with a deterministic fake (this container has
  * no image/audio libraries): every function that would call a codec is
  * marked `STUB` and derives its outputs from a hash of the bytes, so
  * pipelines are exercisable end-to-end and swap to a real codec by
  * replacing one function.
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
        val (fmt, w, h, dur) = fakeDecode(kind, payload) // STUB boundary
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
}
