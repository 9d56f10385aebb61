package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-step evidence for the COMPOSED crawl-to-training-shards
  * pipeline (t94): WARC build -> record walk -> HTML extract ->
  * normalize -> curate -> decontaminate -> token-budget -> pack ->
  * leak-safe split, end to end at multiples of the sf0.1 document
  * count, reporting wall time and total shuffle bytes per step — the
  * composition's growth curve, not just its stages' ([[CurateScale]]
  * measures the curation core alone; lineage/checkpoint bugs live in
  * the seams between stages).
  *
  * Corpus replication is [[CurateScale]]'s rule (copy 0 original, 90%
  * of copies k>0 get a per-copy suffix, 10% byte-identical). The token
  * budget scales with the corpus (500 tokens per base doc) so the
  * budget stage stays non-degenerate instead of truncating every run
  * to the same prefix.
  *
  * Usage: runMain graft.tools.PipelineScale [sfDir] [copies...]
  */
object PipelineScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 3, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    object metrics extends SparkListener {
      @volatile var shuffleWrite = 0L
      @volatile var shuffleRead = 0L
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        shuffleWrite += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        shuffleRead += sc.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
      }
      def reset(): Unit = { shuffleWrite = 0L; shuffleRead = 0L }
    }
    spark.sparkContext.addSparkListener(metrics)

    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "source").localCheckpoint()
    val baseN = base.count()

    def scaled(k: Int): DataFrame =
      (0 until k).map { c =>
        if (c == 0) base
        else base.select(
          (col("doc_id") + lit(c.toLong * 1000000L)).as("doc_id"),
          when(col("doc_id") % 10 === 0, col("text"))
            .otherwise(concat(col("text"), lit(s" copyvariant$c"))).as("text"),
          col("source"))
      }.reduce(_ unionByName _)

    def run(docs: DataFrame, budget: Long): Long = {
      // single-file scans arrive as 1-2 tasks; the ingest chain
      // multiplies work per row — fan out first (t94 does the same)
      val warc = graft.sources.Warc.buildWarc(
        graft.util.FanOut(docs), "doc_id", "text")
      val bench = docs.filter(col("doc_id") % 17 === 0)
        .select("doc_id", "text")
      graft.pipeline.Pipeline.crawlToShards(warc, "warc_id", "payload",
        docs.select("doc_id", "source"), bench, idCol = "doc_id",
        budgetTokens = budget).count()
    }

    // warm pass: JIT/codegen outside the measured steps
    run(base, baseN * 500L)

    copies.foreach { k =>
      val docs = scaled(k).localCheckpoint() // synthesis excluded from timing
      val n = docs.count()
      org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(spark.sparkContext)
      metrics.reset()
      val t0 = System.nanoTime()
      val out = run(docs, n * 500L)
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(spark.sparkContext)
      println(f"PIPELINE_SCALE docs=$n%7d shards=$out%7d wall=$sec%8.2f s " +
        f"shuffle_write=${metrics.shuffleWrite / 1e6}%9.1f MB " +
        f"shuffle_read=${metrics.shuffleRead / 1e6}%9.1f MB")
    }
    spark.stop()
  }
}
