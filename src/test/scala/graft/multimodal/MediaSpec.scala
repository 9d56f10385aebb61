package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MediaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  lazy val media = Media.fromText(
    spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", "video")

  test("media table schema carries binary payload + typed metadata") {
    assert(media.schema("payload").dataType.typeName == "binary")
    assert(media.schema("meta").dataType.typeName == "struct")
    assert(media.count() > 0)
  }

  test("decode stage emits typed metadata per payload, partition-parallel") {
    val d = Media.decode(media)
    assert(d.columns.toSeq == Seq("media_id", "kind", "n_bytes", "format",
      "width", "height", "duration_ms"))
    assert(d.count() == media.count())
    val r = d.filter(col("media_id") === 0).collect()(0)
    assert(r.getLong(2) > 0 && r.getInt(4) >= 64)
    // deterministic stub: same input -> same output
    val r2 = Media.decode(media).filter(col("media_id") === 0).collect()(0)
    assert(r == r2)
  }

  test("frame sampling yields one row per sampled timestamp") {
    val d = Media.decode(media)
    val frames = Media.sampleFrames(d, everyMs = 5000L)
    val joined = frames.groupBy("media_id").count()
      .join(d, "media_id")
      .select(col("count"), (col("duration_ms") / 5000 + 1).cast("long").as("want"))
    assert(joined.filter(col("count") =!= col("want")).count() == 0)
  }

  test("embedding stage emits fixed-dim float vectors") {
    val e = Media.embed(media, dim = 16)
    assert(e.count() == media.count())
    assert(e.select(size(col("embedding"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(16))
  }

  test("BMP build -> parse round trip reads header fields, not build params") {
    val b = Media.buildBmp(33, 21)
    // 33*3=99 -> padded row 100
    assert(b.length == 54 + 100 * 21)
    assert(Media.parseContainer(b).contains(("bmp", 33, 21, 0L)))
  }

  test("WAV build -> parse round trip derives duration from the data chunk") {
    val w = Media.buildWav(8000, 4000) // 0.5 s
    assert(w.length == 44 + 8000)
    assert(Media.parseContainer(w).contains(("wav", 0, 0, 500L)))
    assert(Media.parseContainer("not a container".getBytes).isEmpty)
  }

  test("syntheticMedia payloads decode via the real header parsers") {
    val syn = Media.syntheticMedia(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
    val d = Media.decode(syn)
    assert(d.filter(col("format").isin("bmp", "wav")).count() == d.count())
    assert(d.filter(col("kind") === "image" && col("format") =!= "bmp").count() == 0)
    assert(d.filter(col("kind") === "audio" && col("duration_ms") <= 0).count() == 0)
  }
}
