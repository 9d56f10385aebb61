package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sim.Similarity
import graft.util.DistRank

/** Adversarial one-cell evidence for [[Similarity.prototypePrune]]'s
  * r15 rank de-skew: a corpus of near-constant embeddings (exactly the
  * redundancy D4 prunes) makes k-means collapse every vector into ONE
  * cell, so a `Window.partitionBy(cell)` rank funnels the whole corpus
  * through a single task. The fix ranks with
  * [[DistRank.perKeyRowNumber]] — range-partitioned two-pass row
  * numbers whose max single-task time stays flat as the cell grows.
  *
  * Measures, per corpus size: the isolated rank stage under BOTH
  * implementations (same input frame, same output ranks — the window
  * path is reconstructed here purely as the measured straw man), and
  * the full prototypePrune chain. The growth curves are the
  * BASELINE.md PruneSkew table.
  *
  * Usage: runMain graft.tools.PruneSkew [sizes...]
  */
object PruneSkew {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq
                else Seq(50000, 200000, 800000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    object metrics extends SparkListener {
      @volatile var maxTaskMs = 0L
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskInfo != null && te.taskInfo.duration > maxTaskMs)
          maxTaskMs = te.taskInfo.duration
      def reset(): Unit = maxTaskMs = 0L
    }
    spark.sparkContext.addSparkListener(metrics)

    // near-constant 8-dim embeddings: unit-ish direction plus a tiny
    // per-id perturbation so prototypicality scores still vary — every
    // vector lands in the same k-means cell
    def corpus(n: Int): DataFrame =
      spark.range(n).selectExpr("id as vec_id",
        """transform(sequence(0, 7), j ->
             1.0d + cast(j as double) * cast(id % 997 as double) * 1e-7d)
           as embedding""")

    // the isolated rank-stage input: (vec_id, cell, proto) with ONE cell
    def scored(n: Int): DataFrame =
      spark.range(n).selectExpr("id as vec_id", "0L as cell",
        "round(cast(id % 9973 as double) / 9973.0d, 4) as proto")

    def measure(label: String)(f: => Long): Unit = {
      org.apache.spark.sql.graftbridge.Bridge
        .drainListenerBus(spark.sparkContext)
      metrics.reset()
      val t0 = System.nanoTime()
      val out = f
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graftbridge.Bridge
        .drainListenerBus(spark.sparkContext)
      // "out=", not "rows=": the rank measurements return sum(rank)
      // (so the rank column is genuinely consumed), prototypePrune a
      // row count — the label stays honest for both
      println(f"PRUNE_SKEW $label%-30s out=$out%13d wall=$sec%8.2f s " +
        f"max_task=${metrics.maxTaskMs / 1e3}%7.2f s")
    }

    // warm pass
    DistRank.perKeyRowNumber(scored(2000), "cell",
      Seq(desc("proto"), col("vec_id")), "rank").count()

    sizes.foreach { n =>
      val s = scored(n).localCheckpoint()
      s.count()
      // sum(rank) so the rank is genuinely consumed — a bare count()
      // lets Catalyst prune the whole window away and measures nothing
      measure(s"rank_distrank n=$n") {
        DistRank.perKeyRowNumber(s, "cell",
            Seq(desc("proto"), col("vec_id")), "rank")
          .agg(sum("rank")).head.getLong(0)
      }
      measure(s"rank_window n=$n") {
        val w = Window.partitionBy("cell")
          .orderBy(desc("proto"), col("vec_id"))
        s.withColumn("rank", row_number().over(w).cast("long"))
          .agg(sum("rank")).head.getLong(0)
      }
      val emb = corpus(n).localCheckpoint()
      emb.count()
      measure(s"prototypePrune n=$n") {
        Similarity.prototypePrune(emb, "vec_id", "embedding",
          initIds = Seq(0L, 1L, 2L, 3L), iterations = 2,
          dropFrac = 0.3).count()
      }
    }
    spark.stop()
  }
}
