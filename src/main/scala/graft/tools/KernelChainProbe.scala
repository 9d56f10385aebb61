package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Ad-hoc stage timing for the LshSkew chain under the current
  * candidate kernel: where does the capped chain's wall go?
  * Usage: runMain graft.tools.KernelChainProbe [n]
  */
object KernelChainProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 6000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def corpus(m: Int) =
      spark.range(m).selectExpr(
        "id as doc_id",
        """CASE WHEN id % 2 = 0
             THEN concat(concat_ws(' ', transform(sequence(1, 40),
                    i -> concat('tmpl', cast(i as string)))),
                  ' u', cast(id as string))
             ELSE concat_ws(' ', transform(sequence(1, 40),
                    i -> concat('w', cast(id * 53 + i * 7 as string))))
           END as text""")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // warm
    if (!sys.env.contains("PROBE_NO_WARM")) {
      val d = corpus(500).localCheckpoint()
      val bux = TextOps.lshBuckets(
        TextOps.minhashSignature(d, "doc_id", "text", k = 8), "doc_id", 8, 2).cache()
      val p = TextOps.lshCandidatePairs(bux, "doc_id").cache()
      val v = TextOps.jaccardPairs(d, "doc_id", "text", p)
        .filter(col("jaccard") >= 0.5).select("a_id", "b_id")
      TextOps.dropNearDuplicates(d, "doc_id", v).count()
      bux.unpersist(); p.unpersist()
    }

    val docs = corpus(n).localCheckpoint()
    docs.count()
    val bux = time("buckets+cache") {
      val b = TextOps.lshBuckets(
        TextOps.minhashSignature(docs, "doc_id", "text", k = 8),
        "doc_id", 8, 2).cache()
      b.count(); b
    }
    val pairs = time("candidates") {
      TextOps.lshCandidatePairs(bux, "doc_id").cache()
    }
    time("pairs.count") { pairs.count() }
    time("ids(semi-join set)") {
      pairs.select(col("a_id").as("doc_id"))
        .union(pairs.select(col("b_id").as("doc_id"))).distinct().count()
    }
    locally {
      val ids = pairs.select(col("a_id").as("doc_id"))
        .union(pairs.select(col("b_id").as("doc_id"))).distinct()
      val d = docs.join(ids, Seq("doc_id"), "left_semi")
      val sh = TextOps.explodedShingles(d, "doc_id", "text", 3).distinct()
      val ep = sh.queryExecution.executedPlan.toString
      println("SHINGLES_USES_CACHE=" + ep.contains("InMemoryTableScan") +
        " scans=" + "Scan ExistingRDD".r.findAllIn(ep).length +
        " imts=" + "InMemoryTableScan".r.findAllIn(ep).length)
      time("shingles(distinct)") { sh.count() }
    }
    val verified = time("verify(jaccard)+cache") {
      val v = TextOps.jaccardPairs(docs, "doc_id", "text", pairs)
        .filter(col("jaccard") >= 0.5).select("a_id", "b_id").cache()
      v.count(); v
    }
    time("cc+survivors") {
      TextOps.dropNearDuplicates(docs, "doc_id", verified).count()
    }
    // and the UNCACHED-verified variant the LshSkew chain actually runs
    val v2 = TextOps.jaccardPairs(docs, "doc_id", "text", pairs)
      .filter(col("jaccard") >= 0.5).select("a_id", "b_id")
    time("cc+survivors(lazy verify)") {
      TextOps.dropNearDuplicates(docs, "doc_id", v2).count()
    }
    spark.stop()
  }
}

