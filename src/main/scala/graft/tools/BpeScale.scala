package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Merge-count scale evidence for the trained-BPE path: t61 exercises
  * 12 merges; a realistic tokenizer is 30-50k. This measures, on the
  * sf0.1 corpus, (a) training wall per merge — the driver-looped part:
  * two Spark jobs per merge (vocabulary-sized pair count + argmax
  * collect(1)) against an always-checkpointed <= maxWords-row frame,
  * so the question is fixed per-job overhead, not data growth — and
  * (b) the APPLY side: bpeTokenize folds one literal `replace` per
  * merge into a single expression, so high merge counts stress the
  * codegen path (method-size limits push Janino to fall back), which
  * shows up as per-row cost, not a wrong answer.
  *
  * Usage: runMain graft.tools.BpeScale [sfDir] [mergeCounts...]
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val counts = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(16, 64, 256)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").localCheckpoint()
    val nDocs = docs.count()

    // warm: JIT/codegen for both phases outside the measured steps
    TextOps.bpeTokenize(docs,
      "doc_id", "text", TextOps.bpeTrainMerges(docs, "text", 4)).count()

    counts.foreach { m =>
      val t0 = System.nanoTime()
      val merges = TextOps.bpeTrainMerges(docs, "text", m,
        stopAtExhaustion = true)
      val trainSec = (System.nanoTime() - t0) / 1e9
      val got = merges.size
      val t1 = System.nanoTime()
      val toks = TextOps.bpeTokenize(docs, "doc_id", "text", merges)
      val totTok = toks.agg(sum("n_tokens")).head().getLong(0)
      val applySec = (System.nanoTime() - t1) / 1e9
      val note = if (got < m) s" EXHAUSTED at $got" else ""
      // the driver-loop path: same semantics, no per-merge job overhead
      val t2 = System.nanoTime()
      val mergesD = TextOps.bpeTrainMergesDriver(docs, "text", m,
        stopAtExhaustion = true)
      val driverSec = (System.nanoTime() - t2) / 1e9
      val agree = if (mergesD == merges) "agree" else "DISAGREE"
      // the rank-greedy kernel: apply cost ∝ merges APPLIED per row,
      // not table depth; token totals must agree with the fold exactly
      val t3 = System.nanoTime()
      val totTokG = TextOps.bpeTokenizeGreedy(docs, "doc_id", "text", merges)
        .agg(sum("n_tokens")).head().getLong(0)
      val greedySec = (System.nanoTime() - t3) / 1e9
      val gAgree = if (totTokG == totTok) "agree" else "DISAGREE"
      println(f"BPE_SCALE merges=$got%5d docs=$nDocs%6d " +
        f"train=$trainSec%8.2f s (${trainSec / got * 1000}%7.1f ms/merge) " +
        f"driver=$driverSec%7.2f s (${driverSec / got * 1000}%7.1f ms/merge, $agree) " +
        f"apply=$applySec%7.2f s greedy=$greedySec%7.2f s ($gAgree) " +
        f"tokens=$totTok%9d$note")
    }

    // -- realistic merge depth ----------------------------------------------
    // The sf corpus's pretoken alphabet exhausts at ~126 merges, so the
    // production-depth question (1k-4k+) needs a richer vocabulary: hex
    // words (16-char alphabet, unbounded distinct substrings) sustain
    // thousands of merges. The fold twin is measured at the shallower
    // depths only — its cost is ∝ table size by construction (one
    // whole-document replace per merge) and past ~1k merges a single
    // expression of chained replaces is exactly the documented wrong
    // shape; the greedy kernel is the path that must stay flat.
    val rich = spark.range(20000).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 6).map(j =>
        md5(concat(col("id").cast("string"), lit(s":$j")))): _*).as("text"))
      .localCheckpoint()
    TextOps.bpeTokenizeGreedy(rich, "doc_id", "text",
      TextOps.bpeTrainMergesDriver(rich, "text", 8)).count() // warm
    Seq(128, 512, 2048, 4096).foreach { m =>
      val t0 = System.nanoTime()
      val merges = TextOps.bpeTrainMergesDriver(rich, "text", m,
        stopAtExhaustion = true)
      val trainSec = (System.nanoTime() - t0) / 1e9
      val got = merges.size
      val t1 = System.nanoTime()
      val totG = TextOps.bpeTokenizeGreedy(rich, "doc_id", "text", merges)
        .agg(sum("n_tokens")).head().getLong(0)
      val greedySec = (System.nanoTime() - t1) / 1e9
      val foldNote = if (m > 512) "fold=skipped(depth)" else {
        val t2 = System.nanoTime()
        val totF = TextOps.bpeTokenize(rich, "doc_id", "text", merges)
          .agg(sum("n_tokens")).head().getLong(0)
        val foldSec = (System.nanoTime() - t2) / 1e9
        f"fold=$foldSec%7.2f s (${if (totF == totG) "agree" else "DISAGREE"})"
      }
      println(f"BPE_DEEP merges=$got%5d docs=20000 " +
        f"driver_train=$trainSec%7.2f s (${trainSec / got * 1000}%6.1f ms/merge) " +
        f"greedy=$greedySec%7.2f s $foldNote tokens=$totG%10d")
    }
    spark.stop()
  }
}
