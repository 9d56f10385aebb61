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
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // A/B aid: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" applies arbitrary SQL
    // confs to the timing session (e.g. the objectHashAggregate
    // fallback threshold when isolating an aggregate regression).
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';')
      .filter(_.contains('=')).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sel = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
    // Bench's discipline in miniature: two passes with the data cache
    // dropped between them (JIT warmth kept), min reported — one pass
    // on this VM swings 2-10x under host-scheduler contention.
    def pass() = sel.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      name -> ((System.nanoTime() - t0) / 1e9, n)
    }
    val p1 = pass()
    spark.catalog.clearCache()
    val p2 = pass().toMap
    p1.foreach { case (name, (t1, n)) =>
      val t2 = p2(name)._1
      println(f"QTIME $name%-28s rows=$n%7d wall=${math.min(t1, t2)}%7.2f s  (p1=$t1%.2f p2=$t2%.2f)")
    }
    spark.stop()
  }
}
