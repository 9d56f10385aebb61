package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.text.TextOps

/** Streaming corpus hygiene: scalar simhash equals the batch aggregate;
  * streamed dedup/decontaminate agree with their batch twins. */
class DocStreamsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  def docsBatch = spark.read.parquet(s"$dir/documents.parquet")

  /** FileStreamSource needs a directory; stage the single parquet. */
  lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("docs_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      d.resolve("documents.parquet"))
    d.toString
  }

  test("scalar simhash16Col is bit-for-bit the batch simhash16 aggregate") {
    val viaCol = docsBatch
      .select(col("doc_id"), TextOps.simhash16Col(col("text")).as("simhash"))
    val viaAgg = TextOps.simhash16(docsBatch, "doc_id", "text")
      .select("doc_id", "simhash")
    assert(viaCol.exceptAll(viaAgg).count() == 0)
    assert(viaAgg.exceptAll(viaCol).count() == 0)
  }

  test("scalar simhash64Col is bit-for-bit the batch simhash64 aggregate") {
    val viaCol = docsBatch
      .select(col("doc_id"), TextOps.simhash64Col(col("text")).as("simhash"))
    val viaAgg = TextOps.simhash64(docsBatch, "doc_id", "text")
      .select("doc_id", "simhash")
    assert(viaCol.exceptAll(viaAgg).count() == 0)
    assert(viaAgg.exceptAll(viaCol).count() == 0)
  }

  test("streaming simhash dedup emits one doc per distinct 64-bit signature") {
    val schema = docsBatch.schema
    val stream = spark.readStream.schema(schema).parquet(streamDir)
      .withColumn("ingest_time",
        timestamp_micros(lit(1700000000000000L) + col("doc_id") * 1000000L))
    val q = DocStreams.dedupBySimhash(stream, "text", "ingest_time")
      .writeStream.outputMode("append").format("memory").queryName("doc_dedup")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("doc_dedup")
    val wantSigs = docsBatch
      .select(TextOps.simhash64Col(col("text")).as("s")).distinct().count()
    assert(got.count() == wantSigs, "one survivor per distinct signature")
    val gotSigs = got.select(TextOps.simhash64Col(col("text")).as("s"))
    assert(gotSigs.distinct().count() == got.count(), "no duplicate signatures")
    // 64 bits must separate docs a 16-bit signature would conflate —
    // the r4 advisory failure mode (unrelated docs colliding in-horizon)
    val sigs16 = docsBatch
      .select(TextOps.simhash16Col(col("text")).as("s")).distinct().count()
    assert(wantSigs >= sigs16, "64-bit signatures are at least as fine-grained")
  }

  test("streaming decontamination drops exactly the batch-flagged docs") {
    val schema = docsBatch.schema
    val bench = docsBatch.filter(col("doc_id") < 50)
    val stream = spark.readStream.schema(schema).parquet(streamDir)
    val q = DocStreams.decontaminate(
        stream.filter(col("doc_id") >= 50), bench, "doc_id", "text",
        shingleWords = 3)
      .writeStream.outputMode("append").format("memory").queryName("doc_clean")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("doc_clean").select("doc_id")
    val flagged = TextOps.decontaminate(
      docsBatch.filter(col("doc_id") >= 50), bench, "doc_id", "text",
      shingleWords = 3).select("doc_id")
    val wantClean = docsBatch.filter(col("doc_id") >= 50).select("doc_id")
      .exceptAll(flagged)
    assert(got.count() == wantClean.count())
    assert(got.exceptAll(wantClean).count() == 0,
      "streaming survivors differ from batch-clean docs")
  }
}
