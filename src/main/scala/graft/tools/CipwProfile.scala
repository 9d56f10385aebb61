package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** A/B profiling of the CIPW Dataset.map hot path under BENCH-identical
  * conditions (fresh JVM per run, same warmup, queries in bench order).
  * Usage: runMain graft.tools.CipwProfile [sfDir]
  * Toggle the fan-out via -Dgraft.cipw.fanout=true/false (read by Cipw).
  */
object CipwProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // identical warmup to Bench.scala
    locally {
      import org.apache.spark.sql.functions._
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      li.groupBy("l_returnflag").agg(sum("l_quantity")).collect()
      spark.range(1000)
        .select(explode(split(md5(col("id").cast("string")), "")).as("c"))
        .groupBy("c").count().collect()
      val ox = spark.range(1000).selectExpr(
        "55.0 + id % 10 as SiO2", "1.0 as TiO2", "16.0 as Al2O3",
        "2.0 as Fe2O3", "6.0 as FeO", "0.1 as MnO", "4.0 as MgO",
        "7.0 as CaO", "3.5 as Na2O", "2.0 as K2O", "0.3 as P2O5")
      graft.petro.Cipw.cipwNorm(ox, completeResults = true).count()
      graft.petro.Cipw.cipwNormHb(ox, completeResults = true).count()
    }
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("p13_cipw_simple", "p14_cipw_gcdkit", "p15_cipw_hb")
    val out = names.map { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      f"$n=$dt%.2f"
    }
    println("CIPWPROFILE " + out.mkString(" ") +
      " fanout=" + sys.props.getOrElse("graft.cipw.fanout", "unset"))
    spark.stop()
  }
}
