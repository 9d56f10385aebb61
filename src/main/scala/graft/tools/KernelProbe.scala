package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Isolates the LSH candidate kernel on the real sf0.1 bucket frame:
  * times capped vs uncapped candidate generation and the downstream
  * near-dedup chain, and prints the capped physical plan — the probe
  * behind the round-13 kernel A/B. */
object KernelProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def freshBux() = TextOps.lshBuckets(
      TextOps.minhashSignature(docs, "doc_id", "text", k = 8),
      "doc_id", 8, 2)
    def time(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"KPROBE $tag%-24s n=$n%9d wall=${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    // warm both paths once
    TextOps.lshCandidatePairs(freshBux(), "doc_id").count()
    TextOps.lshCandidatePairs(freshBux(), "doc_id", Int.MaxValue).count()
    spark.catalog.clearCache()
    time("bux-only")(freshBux().count())
    time("cand-uncapped")(
      TextOps.lshCandidatePairs(freshBux(), "doc_id", Int.MaxValue).count())
    spark.catalog.clearCache()
    time("cand-capped")(
      TextOps.lshCandidatePairs(freshBux(), "doc_id").count())
    spark.catalog.clearCache()
    time("chain-uncapped") {
      val p = TextOps.lshCandidatePairs(freshBux(), "doc_id", Int.MaxValue)
      TextOps.dropNearDuplicates(docs, "doc_id",
        TextOps.jaccardPairs(docs, "doc_id", "text", p)
          .filter(col("jaccard") >= 0.5).select("a_id", "b_id")).count()
    }
    spark.catalog.clearCache()
    time("chain-capped") {
      val p = TextOps.lshCandidatePairs(freshBux(), "doc_id")
      TextOps.dropNearDuplicates(docs, "doc_id",
        TextOps.jaccardPairs(docs, "doc_id", "text", p)
          .filter(col("jaccard") >= 0.5).select("a_id", "b_id")).count()
    }
    if (args.length > 1 && args(1) == "explain") {
      println("=== capped plan ===")
      TextOps.lshCandidatePairs(freshBux(), "doc_id").explain("formatted")
    }
    spark.stop()
  }
}
