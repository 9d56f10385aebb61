package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Stage-level timing of [[TextOps.curateCorpus]] under bench-like
  * conditions (local[32], 32 shuffle partitions).
  * Usage: runMain graft.tools.CurateProfile [sfDir]
  */
object CurateProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.props.getOrElse("graft.parallelismFirst", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"CURATE $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($r)")
    }
    // warm up the tokenizer/parquet paths once
    docs.select(size(TextOps.tokens(col("text")))).agg(sum("size(tokens(text))")).collect()
    val id = "doc_id"; val txt = "text"
    // Mirror curateCorpus stage by stage; every localCheckpoint is an
    // eager job, so each `time` block bounds exactly one pipeline piece.
    val groups = docs.groupBy(md5(col(txt)).as("__h"))
      .agg(min(col(id)).as("__canon"), count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
    var exactLosers: org.apache.spark.sql.DataFrame = null
    time("exact_losers_ckpt") {
      exactLosers = docs.select(col(id), md5(col(txt)).as("__h"))
        .join(groups, "__h").filter(col(id) =!= col("__canon"))
        .select(col(id)).localCheckpoint()
      exactLosers.count()
    }
    val exact = docs.join(exactLosers, Seq(id), "left_anti")
    var allSh: org.apache.spark.sql.DataFrame = null
    time("shingles_ckpt") {
      allSh = TextOps.explodedShingles(exact, id, txt, 3).distinct().localCheckpoint()
      allSh.count()
    }
    println(s"CURATE allSh partitions = ${allSh.rdd.getNumPartitions}")
    var bux: org.apache.spark.sql.DataFrame = null
    time("minhash+buckets_ckpt") {
      bux = TextOps.lshBuckets(TextOps.minhashFromShingles(allSh, id, 8), id, 8, 2)
        .localCheckpoint()
      bux.count()
    }
    var cand: org.apache.spark.sql.DataFrame = null
    time("cand_ckpt") {
      cand = TextOps.lshCandidatePairs(bux, id).localCheckpoint()
      cand.count()
    }
    var verified: org.apache.spark.sql.DataFrame = null
    time("jaccard_verify_ckpt") {
      val candIds = cand.select(col("a_id").as(id))
        .union(cand.select(col("b_id").as(id))).distinct()
      verified = TextOps.jaccardFromShingles(
          allSh.join(candIds, Seq(id), "left_semi"), id, cand)
        .filter(col("jaccard") >= 0.5).select("a_id", "b_id").localCheckpoint()
      verified.count()
    }
    var deduped: org.apache.spark.sql.DataFrame = null
    time("cc_resolve") {
      deduped = TextOps.dropNearDuplicates(exact, id, verified)
      deduped.count()
    }
    time("quality_gate") {
      val quality = TextOps.repetitionStats(deduped, id, txt)
        .join(TextOps.langId(deduped, id, txt).select(col(id), col("lang_pred")), Seq(id))
        .filter(col("lang_pred") === "en" && col("n_word").between(20, 80) &&
          col("top_word_frac") <= 0.12)
        .select(col(id))
      deduped.join(quality, Seq(id), "left_semi").count()
    }
    time("full_curate") { TextOps.curateCorpus(docs, id, txt).count() }
    spark.stop()
  }
}
