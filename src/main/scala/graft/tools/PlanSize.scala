package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Reports expression-tree sizes of the optimized plans for the named
  * queries — the metric behind the end-member staging work: a re-inlined
  * denominator shows up as an order-of-magnitude larger tree. */
object PlanSize {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("p05_garnet_endmembers", "p24_cpx_endmembers",
        "p25_amp_endmembers", "p26_spl_endmembers", "p17_site_allocation",
        "p04_droop_split", "p06_alumina_shand")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.optimizedPlan
      val planNodes = plan.collect { case p => p }.size
      val exprNodes = plan.collect { case p =>
        p.expressions.map(e => e.collect { case x => x }.size).sum
      }.sum
      println(f"PLANSIZE $n%-26s planNodes=$planNodes%3d exprNodes=$exprNodes%7d")
    }
    spark.stop()
  }
}
