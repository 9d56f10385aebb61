package graft.tools

import org.apache.spark.sql.SparkSession

/** Quick cold-JVM timing of a named-prefix subset of the registry —
  * the iteration aid behind per-query regression hunts (Bench runs
  * everything; this runs just the queries under investigation, same
  * session config, one timed pass each in registry order).
  *
  * Usage: runMain graft.tools.QTime <prefix,prefix,...> [sfDir]
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val prefixes = args.headOption.getOrElse("t12").split(',').toSeq
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"QTIME $name%-28s rows=$n%7d wall=${(System.nanoTime() - t0) / 1e9}%7.2f s")
      }
    spark.stop()
  }
}
