package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.multimodal.Media

class MediaStreamsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming envelope dedup keeps one clip per distinct fingerprint") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // 4 envelope classes x 3 byte-identical clips each + junk payloads:
    // the stream must emit exactly one clip per distinct envelope and
    // drop the undecodable rows
    def amps(cls: Long) =
      (0 until 16).map(w => (((cls * 37 + w * 11) % 15) + 1).toInt * 256 + 128)
    val clips = for (cls <- 0L until 4L; c <- 0 until 3) yield
      (cls * 10 + c, Media.buildSquareWav(amps(cls)))
    val junk = Seq((99L, Array.fill[Byte](32)(0x13)))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000)
    val in = MemoryStream[(Long, Array[Byte], java.sql.Timestamp)]
    val stream = in.toDF.toDF("media_id", "payload", "ingest_time")
    val q = MediaStreams.dedupByEnvelope(stream, "audio", "ingest_time")
      .writeStream.outputMode("append").format("memory")
      .queryName("env_dedup").start()
    in.addData((clips ++ junk).map { case (id, p) => (id, p, ts(id)) })
    q.processAllAvailable()
    q.stop()
    val got = spark.table("env_dedup")
      .select("media_id", "fingerprint").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    // one survivor per class, fingerprints = the batch kernel's values
    assert(got.length == 4, s"got ${got.mkString(",")}")
    val wantFps = (0L until 4L)
      .map(cls => Media.audioFingerprintOf(Media.buildSquareWav(amps(cls))).get)
      .toSet
    assert(got.map(_._2).toSet == wantFps)
    assert(got.map(_._1 / 10).toSet == Set(0L, 1L, 2L, 3L))
  }

  test("video kind routes through the video fingerprint kernel") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val payload = Media.buildMp4FramesWith(8, 6, 16, 10, mjpeg = false,
      (_, _, f) => ((f % 15 + 1) << 4) | 8)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000)
    val in = MemoryStream[(Long, Array[Byte], java.sql.Timestamp)]
    val stream = in.toDF.toDF("media_id", "payload", "ingest_time")
    val q = MediaStreams.dedupByEnvelope(stream, "video", "ingest_time")
      .writeStream.outputMode("append").format("memory")
      .queryName("venv_dedup").start()
    in.addData(Seq((1L, payload, ts(1)), (2L, payload, ts(2))))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("venv_dedup").collect()
    assert(got.length == 1)
    assert(got(0).getLong(1) == Media.videoFingerprintOf(payload).get)
  }
}
