package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType, TimestampType}

import graft.multimodal.Media

/** Streaming media hygiene — the multimodal siblings of
  * [[DocStreams]]: envelope-fingerprint dedup for audio/video clips
  * arriving on a stream, built on the SAME per-payload fingerprint
  * kernels the batch operators use ([[Media.audioFingerprintOf]] /
  * [[Media.videoFingerprintOf]]), so stream and batch can never
  * disagree on what a clip's envelope is.
  */
object MediaStreams {

  /** Online exact-envelope dedup — [[DocStreams.dedupBySimhash]]'s
    * media twin: a clip whose 64-bit envelope fingerprint (audio
    * energy via [[Media.audioFingerprintOf]] when `kind = "audio"`,
    * video luminance via [[Media.videoFingerprintOf]] otherwise)
    * matches one already seen inside the watermark horizon is
    * discarded; undecodable payloads are dropped (they carry no
    * dedupable content signal — route them to a quarantine sink
    * upstream if they must be kept). For Hamming-tolerant matching
    * run the batch [[Media.audioNearDups]]/[[Media.videoNearDups]]
    * over the survivors periodically — the exact split
    * [[DocStreams.dedupBySimhash]] documents for text.
    *
    * Scale shape: the fingerprint is a narrow per-partition map (no
    * aggregation state), and dropDuplicatesWithinWatermark keeps one
    * state row per distinct envelope inside the horizon — memory
    * tracks the horizon's envelope cardinality, never the stream's
    * length or the payload bytes. */
  def dedupByEnvelope(media: DataFrame, kind: String,
      eventTimeCol: String, watermark: String = "2 hours"): DataFrame = {
    require(kind == "audio" || kind == "video",
      s"kind must be audio or video, got $kind")
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("__fp", LongType),
      StructField("__ts", TimestampType)))
    val enc = Encoders.row(schema)
    val fp = media
      .select(col("media_id").cast("long"), col("payload"),
        col(eventTimeCol).cast("timestamp"))
      .mapPartitions { rows =>
        rows.map { r =>
          val sig =
            if (kind == "audio") Media.audioFingerprintOf(r.getAs[Array[Byte]](1))
            else Media.videoFingerprintOf(r.getAs[Array[Byte]](1))
          Row(r.getLong(0), sig.map(java.lang.Long.valueOf).orNull,
            r.getTimestamp(2))
        }
      }(enc)
    fp.filter(col("__fp").isNotNull)
      .withWatermark("__ts", watermark)
      .dropDuplicatesWithinWatermark(Seq("__fp"))
      .select(col("media_id"), col("__fp").as("fingerprint"),
        col("__ts").as(eventTimeCol))
  }
}
