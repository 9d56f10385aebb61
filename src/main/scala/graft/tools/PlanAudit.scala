package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for a set of registry queries —
  * the scale-posture audit loop (pushdown, broadcast vs shuffle,
  * WholeStageCodegen spans). Usage:
  *   runMain graft.tools.PlanAudit [sfDir] q1 q2 ...
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("t23_mixture_sample", "t24_pack_sequences", "t26_top_ngrams")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      println(graft.SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
