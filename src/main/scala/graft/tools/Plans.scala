package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints physical plans for representative queries — the
  * scan-pushdown / broadcast / codegen checklist. */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_pricing_summary", "q04_brand_quantity",
        "p05_garnet_endmembers", "t04_minhash_signature")
    for (name <- names) {
      println(s"\n========== $name ==========")
      graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
