package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` of every registry query (or a prefix
  * subset) to one file per query — the plan evidence the optimization
  * rounds commit under plans/r*. Bench-identical session config.
  * Usage: runMain graft.tools.PlanDump <outDir> [prefix,prefix,...] [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/root/repo/plans/r17/before")
    val prefixes = args.lift(1).map(_.split(',').toSeq)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val sel = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.forall(_.exists(n.startsWith)) }
    var failed = List.empty[String]
    sel.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/$name.txt"), plan)
      } catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
    }
    println(s"PLANDUMP wrote ${sel.size - failed.size} plans to $outDir" +
      (if (failed.nonEmpty) s"; FAILED: ${failed.sorted.mkString(",")}" else ""))
    spark.stop()
  }
}
