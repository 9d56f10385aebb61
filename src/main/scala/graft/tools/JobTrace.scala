package graft.tools

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-JOB census of one registry query: job id, wall ms, task count,
  * summed task ms and the job group/description — the drill-down one
  * level below [[JobStats]] for queries whose wall is orchestration-
  * bound (many small eager jobs). Jobs are attributed by callSite when
  * no description is set. Usage:
  * runMain graft.tools.JobTrace <query> [sfDir]
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val qname = args.headOption.getOrElse("t128")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class J(desc: String, t0: Long) {
      val tasks = new AtomicInteger(0)
      val taskMs = new AtomicLong(0L)
      @volatile var wallMs: Long = -1
    }
    val jobs = new ConcurrentHashMap[Int, J]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val stageToJob = new ConcurrentHashMap[Int, Int]()
    val execDesc = new ConcurrentHashMap[String, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            execDesc.put(s.executionId.toString,
              s.description.linesIterator.nextOption().getOrElse("?"))
            sys.env.get("JOBTRACE_PLANS").foreach { dir =>
              val w = new java.io.PrintWriter(s"$dir/exec_${s.executionId}.txt")
              try { w.println(s.description); w.println(); w.println(s.physicalPlanDescription) }
              finally w.close()
            }
          case _ => ()
        }
      override def onJobStart(s: SparkListenerJobStart): Unit = {
        val p = Option(s.properties)
        val desc = p.flatMap(x => Option(x.getProperty("spark.sql.execution.id")))
          .flatMap(id => Option(execDesc.get(id)).map(d => s"[exec $id] $d"))
          .orElse(p.flatMap(x => Option(x.getProperty("spark.job.description"))))
          .orElse(p.flatMap(x => Option(x.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs.put(s.jobId, J(desc, System.nanoTime()))
        order.add(s.jobId)
        s.stageIds.foreach(st => stageToJob.put(st, s.jobId))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId)
        if (j != null) j.wallMs = (System.nanoTime() - j.t0) / 1000000L
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val jid = stageToJob.get(t.stageId)
        val j = if (jid != null) jobs.get(jid) else null
        if (j != null) {
          j.tasks.incrementAndGet()
          if (t.taskMetrics != null) j.taskMs.addAndGet(t.taskMetrics.executorRunTime)
        }
      }
    })
    val fn = graft.SparkEntry.queries(qname)
    // warm pass (JIT + codegen), then the traced pass
    fn(spark, sfDir).count()
    spark.catalog.clearCache()
    graft.util.DistRank.clearKeyCountCache()
    Thread.sleep(300)
    jobs.clear(); order.clear(); stageToJob.clear()
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(400)
    println(f"JOBTRACE $qname wall=$wall%.2f s rows=$n jobs=${jobs.size()}")
    var i = 0
    order.forEach { jid =>
      val j = jobs.get(jid)
      println(f"  job#$i%3d wall=${j.wallMs}%6d ms tasks=${j.tasks.get}%5d " +
        f"taskMs=${j.taskMs.get}%7d  ${j.desc.take(110)}")
      i += 1
    }
    spark.stop()
  }
}
