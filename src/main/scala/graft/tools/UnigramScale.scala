package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Scale evidence for the unigram tokenizer's two claims:
  *
  * (a) APPLY cost is independent of vocabulary size — the Viterbi
  * kernel does O(chars x maxPieceLen) hash probes per row regardless
  * of how many pieces the table holds (a 32k- or 256k-piece model is
  * the same per-row work as a 300-piece one). Measured by padding the
  * trained model with never-matching pieces (underscores cannot occur
  * in [a-z0-9] tokens) and re-timing the same decode.
  *
  * (b) APPLY cost grows ~linearly in maxPieceLen (the DP's inner
  * candidate scan), the knob a deployment actually tunes.
  *
  * Usage: runMain graft.tools.UnigramScale [sfDir]
  */
object UnigramScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").localCheckpoint()
    val nDocs = docs.count()

    val t0 = System.nanoTime()
    val model = TextOps.unigramTrainScores(docs, "doc_id", "text",
        vocabSize = 64, maxPieceLen = 8)
      .select("piece", "score_micro").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val trainSec = (System.nanoTime() - t0) / 1e9
    println(f"train: vocabSize=64 maxPieceLen=8 -> ${model.size} pieces " +
      f"in $trainSec%.2f s over $nDocs docs")

    def applySec(vocab: Seq[(String, Long)], maxPieceLen: Int): Double = {
      val t = System.nanoTime()
      TextOps.unigramTokenizeWith(docs, "doc_id", "text", vocab, maxPieceLen)
        .agg(sum("n_pieces")).head()
      (System.nanoTime() - t) / 1e9
    }
    applySec(model, 8) // warm JIT/codegen

    // (a) vocab-size independence: pad with never-matching pieces
    Seq(0, 10000, 100000, 1000000).foreach { extra =>
      val padded = model ++
        (0 until extra).map(i => (s"_pad_$i", -20000000L))
      val s = applySec(padded, 8)
      println(f"apply: |vocab|=${padded.size}%7d maxPieceLen=8 -> $s%.2f s")
    }

    // (a') the broadcast form at the same sizes: the model ships once
    // per application (the caller holds the handle), so re-planning
    // with a padded-1M model should collapse back to the small-model
    // cost after the first (distribution-paying) run
    Seq(0, 1000000).foreach { extra =>
      val padded = model ++
        (0 until extra).map(i => (s"_pad_$i", -20000000L))
      val bc = TextOps.unigramBroadcastModel(spark, padded, 8)
      def one(): Double = {
        val t = System.nanoTime()
        TextOps.unigramTokenizeWithBroadcast(docs, "doc_id", "text", bc)
          .agg(sum("n_pieces")).head()
        (System.nanoTime() - t) / 1e9
      }
      val first = one()
      val second = one()
      println(f"apply-bcast: |vocab|=${padded.size}%7d -> " +
        f"first $first%.2f s, re-plan $second%.2f s")
      bc.destroy()
    }

    // (b) maxPieceLen growth (same 64-multi model, longer DP scan)
    Seq(2, 4, 8, 16, 32).foreach { l =>
      val s = applySec(model, l)
      println(f"apply: |vocab|=${model.size}%7d maxPieceLen=$l%2d -> $s%.2f s")
    }
    spark.stop()
  }
}
