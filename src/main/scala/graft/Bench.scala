package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up JIT/codegen/parquet-reader paths so the first timed query
    // isn't charged the one-time JVM startup cost.
    locally {
      import org.apache.spark.sql.functions._
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      li.groupBy("l_returnflag").agg(sum("l_quantity")).collect()
      spark.range(1000)
        .select(explode(split(md5(col("id").cast("string")), "")).as("c"))
        .groupBy("c").count().collect()
      // Dataset.map / Encoders.row path (CIPW row functions) has its own
      // deserializer + codegen warm-up separate from the SQL-only paths.
      // Shape matches p14/p15 exactly (id carry + the 12 present inputs +
      // normsum) so the SAME generated (de)serializers are compiled, and
      // 30k rows push the row functions past HotSpot's C2 compile
      // threshold (10k invocations) before anything is timed.
      val ox = spark.range(30000).selectExpr(
        "id",
        "55.0 + id % 10 as SiO2", "1.0 as TiO2", "16.0 as Al2O3",
        "2.0 as Fe2O3", "6.0 as FeO", "0.1 as MnO", "4.0 as MgO",
        "7.0 as CaO", "3.5 as Na2O", "2.0 as K2O", "0.3 as P2O5",
        "0.1 + id % 3 as Cr2O3")
      graft.petro.Cipw.cipwNorm(ox, carry = Seq("id"),
        normsum = true, completeResults = true).count()
      graft.petro.Cipw.cipwNormHb(ox, carry = Seq("id"),
        normsum = true, completeResults = true).count()
    }
    // A query that throws is recorded with time -1 and listed under
    // "failed" so a broken query can never masquerade as a fast one.
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => failed ::= name; false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }.toMap
    // The harness that collects this output keeps only the TAIL of stdout
    // (~2000 chars), so the final JSON line must stay well under that:
    // query keys are the short id prefix ("p14_cipw_gcdkit" -> "p14" —
    // unique across the registry; full names are in CORRECTNESS_r*.json
    // and on the diagnostic line below) and times are millisecond-rounded.
    def fmt(v: Double): String = f"$v%.3f"
    val prefixes = results.keys.groupBy(_.takeWhile(_ != '_'))
    // Fall back to the full name if two ids ever share a prefix, so the
    // compaction can never silently merge two queries into one key.
    def short(name: String): String = {
      val p = name.takeWhile(_ != '_')
      if (prefixes(p).size == 1) p else name
    }
    val fs = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum
    // Diagnostic only (value/queries below are the measurement): re-time
    // the slowest queries warm, so a cold-vs-warm gap (JIT/codegen not
    // absorbed by warmup) is distinguishable from environmental cost.
    val warm = results.toSeq.filter(_._2 >= 0).sortBy(-_._2).take(5).map {
      case (name, _) =>
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, sfDir).count()
        catch { case _: Throwable => }
        name -> (System.nanoTime() - t0) / 1e9
    }
    val ws = warm.map { case (k, v) => s"\"$k\":${fmt(v)}" }
      .mkString("{", ",", "}")
    val qsFull = results.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"$k\":${fmt(v)}" }.mkString("{", ",", "}")
    // Full-name timings + warm re-runs, for humans reading the whole log.
    println(s"""{"diag":"full_names","queries":$qsFull,"queries_warm":$ws}""")
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"${short(k)}\":${fmt(v)}" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"failed":$fs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
