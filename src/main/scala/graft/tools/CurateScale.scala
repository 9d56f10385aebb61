package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Scale-step evidence for the curation pipeline: runs
  * [[TextOps.curateCorpus]] end-to-end at multiples of the sf0.1
  * document count (5k -> 15k -> 50k ~ sf1-equivalent) and reports wall
  * time plus total shuffle read/write bytes per step, so the 100 TB
  * "no scale-killer" claim has measured growth curves behind it, not
  * just plan inspection.
  *
  * The scaled corpus replicates the real sf0.1 documents with an id
  * offset; copy 0 keeps the original text (so every original near-dup
  * group survives) and copies k>0 append a per-copy suffix word to 90%
  * of docs — the remaining 10% stay byte-identical across copies to
  * keep exercising exact dedup at every scale.
  *
  * Usage: runMain graft.tools.CurateScale [sfDir] [copies...]
  */
object CurateScale {
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
      .select("doc_id", "text").localCheckpoint()
    val baseN = base.count()

    def scaled(k: Int): DataFrame =
      (0 until k).map { c =>
        if (c == 0) base
        else base.select(
          (col("doc_id") + lit(c.toLong * 1000000L)).as("doc_id"),
          when(col("doc_id") % 10 === 0, col("text"))
            .otherwise(concat(col("text"), lit(s" copyvariant$c"))).as("text"))
      }.reduce(_ unionByName _)

    // one warm pass so the first measured step isn't charged JIT/codegen
    TextOps.curateCorpus(base, "doc_id", "text").count()

    copies.foreach { k =>
      val docs = scaled(k).localCheckpoint() // input materialized: timing
      val n = docs.count()                   // excludes synthesis cost
      // Listener events are delivered asynchronously: drain the bus so
      // the synthesis job's stages land before the reset, and again so
      // the measured job's stages land before the read.
      org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(spark.sparkContext)
      metrics.reset()
      val t0 = System.nanoTime()
      val out = TextOps.curateCorpus(docs, "doc_id", "text").count()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(spark.sparkContext)
      println(f"CURATE_SCALE docs=$n%7d survivors=$out%7d wall=$sec%8.2f s " +
        f"shuffle_write=${metrics.shuffleWrite / 1e6}%9.1f MB " +
        f"shuffle_read=${metrics.shuffleRead / 1e6}%9.1f MB")
    }
    spark.stop()
  }
}
