package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Orchestration-overhead census: per registry query, wall seconds vs
  * the number of Spark jobs / stages / tasks and the summed executor
  * task time. A query whose wall far exceeds its summed task time /
  * cores is bounded by job-launch + planning + codegen overhead, not
  * by compute — the local-bench signature of an operator that launches
  * many small eager jobs (barrier populates, heavy-key counts, kernel
  * rounds). Usage: runMain graft.tools.JobStats <prefix,prefix,...> [sfDir]
  */
object JobStats {
  def main(args: Array[String]): Unit = {
    val prefixes = args.headOption.getOrElse("t94").split(',').toSeq
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0L)
    val cpuTimeMs = new AtomicLong(0L)
    val deserMs = new AtomicLong(0L)
    val gcMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) {
          taskTimeMs.addAndGet(t.taskMetrics.executorRunTime)
          cpuTimeMs.addAndGet(t.taskMetrics.executorCpuTime / 1000000L)
          deserMs.addAndGet(t.taskMetrics.executorDeserializeTime)
          gcMs.addAndGet(t.taskMetrics.jvmGCTime)
        }
      }
    })
    val sel = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
    // one throwaway pass per query so JIT/codegen warmth mirrors the
    // bench's second (min-reported) pass, then the measured pass
    sel.foreach { case (name, fn) =>
      fn(spark, sfDir).count()
      spark.catalog.clearCache()
      graft.util.DistRank.clearKeyCountCache()
      Thread.sleep(200)
      jobs.set(0); stages.set(0); tasks.set(0); taskTimeMs.set(0L)
      cpuTimeMs.set(0L); deserMs.set(0L); gcMs.set(0L)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let straggler listener events drain
      println(f"JOBSTATS $name%-34s wall=$wall%7.2f s jobs=${jobs.get}%3d " +
        f"stages=${stages.get}%3d tasks=${tasks.get}%5d " +
        f"taskTime=${taskTimeMs.get / 1000.0}%8.2f s " +
        f"cpu=${cpuTimeMs.get / 1000.0}%8.2f s " +
        f"deser=${deserMs.get / 1000.0}%7.2f s " +
        f"gc=${gcMs.get / 1000.0}%6.2f s rows=$n%7d")
      spark.catalog.clearCache()
      graft.util.DistRank.clearKeyCountCache()
    }
    spark.stop()
  }
}
