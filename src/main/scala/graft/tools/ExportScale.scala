package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Export-tier throughput: writes the sf corpus through all three
  * named-shard sinks (WebDataset tars with planted BMP payloads, JSONL
  * gz shards, TFRecord shards) and reports wall seconds + emitted
  * bytes per format — the sink-side floor a 100 TB export planner
  * scales from (shards are independent; wall ∝ corpus / min(nShards,
  * cores)).
  *
  * Usage: runMain graft.tools.ExportScale [sfDir] [nShards]
  */
object ExportScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nShards = if (args.length > 1) args(1).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text").localCheckpoint()
    val nDocs = docs.count()
    val tmp = java.nio.file.Files.createTempDirectory("exportscale")

    def timed(name: String)(run: String => org.apache.spark.sql.DataFrame): Unit = {
      val out = tmp.resolve(name).toString
      val t0 = System.nanoTime()
      val report = run(out).agg(sum("bytes_written")).head()
      val sec = (System.nanoTime() - t0) / 1e9
      val mb = report.getLong(0) / 1e6
      println(f"export: $name%-12s $nDocs docs -> $mb%8.1f MB in $sec%6.2f s " +
        f"(${mb / sec}%6.1f MB/s)")
    }

    timed("jsonl_gz")(out =>
      graft.sources.Jsonl.writeShards(docs, "doc_id", out, nShards))
    timed("jsonl")(out =>
      graft.sources.Jsonl.writeShards(docs, "doc_id", out, nShards,
        gzip = false))
    timed("tfrecord")(out =>
      graft.sources.TfRecord.writeShards(docs, "doc_id", "text", out, nShards))
    timed("tf_example")(out =>
      graft.sources.TfRecord.writeExamples(docs, "doc_id",
        Seq("doc_id" -> col("doc_id"), "source" -> col("source"),
          "text" -> col("text")), out, nShards))
    val media = graft.multimodal.Media
      .syntheticPatternBmps(docs, "doc_id")
      .select(col("media_id").as("doc_id"), col("payload"))
      .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
    timed("webdataset")(out =>
      graft.multimodal.WebDataset.writeShards(media, "doc_id", "payload",
        "text", out, nShards))
    spark.stop()
  }
}
