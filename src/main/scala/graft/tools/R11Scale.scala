package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Scale-step evidence for the round-11 operators (t100-t104): wall and
  * shuffle bytes at 1x/3x/10x the sf0.1 document rows, same
  * listener-drain discipline as [[DedupScale]].
  *
  * What each step must show at 10x:
  *  - kmvSketch/kmvSourceOverlap: the SKETCH row count stays at
  *    |sources| x k no matter the corpus (the whole point of KMV); wall
  *    tracks the distinct-shingle pass linearly.
  *  - weightedSample: output fixed at k x |sources|; wall ~linear in
  *    the key-projection pass.
  *  - dropNearDuplicatesBy: same cost class as the min-id path (the
  *    extra window only sees clustered docs) — measured against
  *    dropNearDuplicates on the identical pair frame.
  *  - dropExactDuplicatesNormalized: one hash aggregate, ~exact-dedup
  *    cost.
  *
  * Document copies reuse DedupScale's variant rule (10% byte-identical,
  * the rest suffix-perturbed) so dedup keeps real work.
  *
  * Usage: runMain graft.tools.R11Scale [sfDir] [copies...]
  */
object R11Scale {
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
    def drain(): Unit =
      org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(spark.sparkContext)

    def measure(label: String, n: Long)(job: => Long): Unit = {
      drain(); metrics.reset()
      val t0 = System.nanoTime()
      val out = job
      val sec = (System.nanoTime() - t0) / 1e9
      drain()
      println(f"R11_SCALE op=$label%-16s rows=$n%8d out=$out%8d wall=$sec%8.2f s " +
        f"shuffle_write=${metrics.shuffleWrite / 1e6}%9.1f MB " +
        f"shuffle_read=${metrics.shuffleRead / 1e6}%9.1f MB")
    }

    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
      .withColumn("source", concat(lit("s"), pmod(col("doc_id"), lit(7L))))
      .localCheckpoint()

    def scaledDocs(k: Int): DataFrame =
      (0 until k).map { c =>
        if (c == 0) docs0
        else docs0.select(
          (col("doc_id") + lit(c.toLong * 1000000L)).as("doc_id"),
          when(col("doc_id") % 10 === 0, col("text"))
            .otherwise(concat(col("text"), lit(s" segvariant$c"))).as("text"),
          col("source"))
      }.reduce(_ unionByName _)

    def lshPairs(docs: DataFrame): DataFrame = {
      val sigs = TextOps.minhashSignature(docs, "doc_id", "text", k = 8)
      val bux = TextOps.lshBuckets(sigs, "doc_id", k = 8, rows = 2)
        .localCheckpoint()
      TextOps.lshCandidatePairs(bux, "doc_id")
    }

    // t107-shaped synthetic segments: per-source nav (100% of the
    // source -> removed), promo by doc parity (~50% -> removed), a
    // ~17% pool paragraph (kept), the doc's own text (unique, kept).
    // source = doc_id % 7 and gcd(7, 6) = gcd(7, 2) = 1, so the
    // in-source frequencies hold at any scale
    def segDocs(docs: DataFrame): DataFrame =
      docs.select(col("doc_id"), col("source"),
        concat_ws("\n\n",
          concat(lit("nav menu for "), col("source")),
          concat(lit("pool para "), (col("doc_id") % 6).cast("string")),
          concat(lit("promo banner "), (col("doc_id") % 2).cast("string")),
          col("text")).as("ptext"))

    // warm pass: JIT/codegen before anything is timed
    TextOps.kmvSketch(docs0, "source", "text", k = 256).count()
    TextOps.removeBoilerplateSegments(segDocs(docs0), "doc_id", "source",
      "ptext").count()
    TextOps.mixtureAllocate(docs0, "source", "text",
      pmod(substring(col("source"), 2, 5).cast("int"), lit(4)) + 1,
      budgetTokens = 100000L).count()
    TextOps.weightedSample(docs0, "doc_id", "source",
      size(TextOps.tokens(col("text"))).cast("double"), k = 20).count()
    TextOps.dropExactDuplicatesNormalized(docs0, "doc_id", "text").count()
    locally {
      val p = lshPairs(docs0).localCheckpoint()
      TextOps.dropNearDuplicatesBy(docs0, "doc_id", p,
        size(TextOps.tokens(col("text"))).cast("long")).count()
    }

    copies.foreach { k =>
      val docs = scaledDocs(k).localCheckpoint()
      val n = docs.count()

      measure("kmv_sketch", n) {
        TextOps.kmvSketch(docs, "source", "text", k = 256).count()
      }
      measure("kmv_overlap", n) {
        val sk = TextOps.kmvSketch(docs, "source", "text", k = 256)
          .localCheckpoint()
        TextOps.kmvSourceOverlap(sk, "source", k = 256).count()
      }
      measure("weighted_sample", n) {
        TextOps.weightedSample(docs, "doc_id", "source",
          size(TextOps.tokens(col("text"))).cast("double"), k = 20).count()
      }
      measure("norm_exact_dedup", n) {
        TextOps.dropExactDuplicatesNormalized(docs, "doc_id", "text").count()
      }
      // hot set must stay CONSTANT (nav x 7 + promo x 14) while docs
      // grow — the broadcast mark is the 100 TB posture claim
      measure("boilerplate_rm", n) {
        TextOps.removeBoilerplateSegments(segDocs(docs), "doc_id",
          "source", "ptext").count()
      }
      // one corpus token-count pass; the water-filling itself runs on
      // the 7-row source frame, so wall tracks the scan alone
      measure("mixture_alloc", n) {
        TextOps.mixtureAllocate(docs, "source", "text",
          pmod(substring(col("source"), 2, 5).cast("int"), lit(4)) + 1,
          budgetTokens = 100000L).count()
      }
      // pair frame shared by the two survivor conventions so the delta
      // is EXACTLY the selection policy, not the LSH chain
      val pairFrame = lshPairs(docs).localCheckpoint()
      measure("neardup_min_id", n) {
        TextOps.dropNearDuplicates(docs, "doc_id", pairFrame).count()
      }
      measure("neardup_best", n) {
        TextOps.dropNearDuplicatesBy(docs, "doc_id", pairFrame,
          size(TextOps.tokens(col("text"))).cast("long")).count()
      }
    }
    spark.stop()
  }
}
