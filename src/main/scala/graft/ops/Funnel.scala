package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed funnel analysis: per key, the earliest strictly-ordered
  * completion of a step sequence (click → purchase → repeat-purchase…)
  * — the product-analytics operator Spark lacks natively, and a
  * curation primitive (e.g. "crawl → extract → survive-dedup" reach
  * per source).
  *
  * Semantics (the greedy earliest-advance funnel, layered-min form):
  * `t_1 = min{t : step_1(e)}`, and
  * `t_i = min{t > t_(i-1) : step_i(e)}` — each advance must be
  * STRICTLY later than the previous one, so one event can never
  * satisfy two steps and the result is independent of the order of
  * simultaneous events. Greedy earliest-advance is optimal for
  * unwindowed funnels: delaying any advance can only shrink the set of
  * events available for later steps.
  *
  * Scale design: the naive formulation is k self-joins (step i joined
  * to step i-1 per key) — k shuffles and a fanout hazard on hot keys.
  * This runs through [[graft.util.DistRank]]'s HYBRID scan dispatch:
  * normal keys fold hash-partitioned in a single pass (unbounded key
  * cardinality, no driver table); keys above the heavy-row threshold
  * take the two-pass range scan, where pass 1 folds each partition's
  * per-key run into a SIMULATION VECTOR (the funnel state
  * transformation for every possible entry stage — k+1 small states,
  * k ≤ 8), the driver composes the vectors per key in partition order,
  * and pass 2 replays each run from its carried-in state. A hot key
  * (one bot user with a corpus-scale share of events) spreads over
  * many partitions — the same flat-max-task posture as
  * `perKeySessionIds`.
  *
  * Why entry-stage-only simulation is exact: the advance condition
  * `t > t_prev` also references the previous advance TIME, but the
  * range partitioner maps rows with equal (key, time) to the same
  * partition, so a carried `t_prev` from an earlier partition is
  * strictly below every time in the current one — only the
  * within-partition strict check can ever bind.
  */
object Funnel {

  /** Append-free funnel reach: one row per distinct `keyCol` value
    * with `stages_reached` (0..k) and `step_i_us` epoch-micros
    * timestamps (NULL from the first unreached step). `timeUsCol` must
    * be LongType epoch micros; NULL-time events are ignored. `steps`
    * are boolean predicate Columns over the event frame's columns, in
    * funnel order (at most 8 — the simulation vector is k+1 states per
    * run). */
  def matchSteps(events: DataFrame, keyCol: String, timeUsCol: String,
      steps: Seq[Column]): DataFrame = {
    val k = steps.size
    require(k >= 1 && k <= 8, s"1..8 funnel steps supported, got $k")
    require(events.schema(timeUsCol).dataType == LongType,
      s"matchSteps needs an epoch-micros LongType time column; " +
        s"`$timeUsCol` is ${events.schema(timeUsCol).dataType.simpleString}")
    val flagged = events
      .filter(col(timeUsCol).isNotNull)
      .select(col(keyCol) +: col(timeUsCol) +:
        steps.zipWithIndex.map { case (p, i) =>
          coalesce(p.cast("boolean"), lit(false)).as(s"__p$i")
        }: _*)
    // pre-shuffle column order, observed identically by both passes
    val tIdx = 1
    val pIdx0 = 2
    val stField = StructField("__funnel", StructType(
      StructField("stage", IntegerType, nullable = false) +:
        (1 to k).map(i => StructField(s"step_${i}_us", LongType,
          nullable = true))), nullable = false)

    // One funnel state: stages completed + their advance times (valid
    // for indices < stage). UNSET marks an unknown entry time in run
    // simulations — strictly below every real time by the partitioning
    // argument above.
    val UNSET = Long.MinValue
    def advance(stage: Int, times: Array[Long], r: Row): Int = {
      if (stage >= k || !r.getBoolean(pIdx0 + stage)) stage
      else {
        val t = r.getLong(tIdx)
        if (stage == 0 || times(stage - 1) == UNSET || t > times(stage - 1)) {
          times(stage) = t
          stage + 1
        } else stage
      }
    }

    // run summary: for every entry stage s, the exit stage and the
    // advance times set within this run (indices s until exit)
    final case class Sim(exit: Array[Int], times: Array[Array[Long]])
    val scanned = graft.util.DistRank.scanHybrid[(Int, Array[Long]), Sim](
      flagged, keyCol, Seq(col(timeUsCol)), stField,
      Some(graft.util.DistRank.defaultHeavyRowThreshold(events.sparkSession)))(
      summary = { (m, r) =>
        var s = 0
        while (s <= k) {
          m.exit(s) = advance(m.exit(s), m.times(s), r)
          s += 1
        }
        m
      },
      summary0 = Sim(Array.tabulate(k + 1)(identity),
        Array.fill(k + 1)(Array.fill(k)(UNSET))),
      init = (0, Array.fill(k)(UNSET)),
      carry = { case ((stage, times), m) =>
        val exit = m.exit(stage)
        val merged = times.clone()
        var i = stage
        while (i < exit) { merged(i) = m.times(stage)(i); i += 1 }
        (exit, merged)
      },
      step = { case ((stage, times), r) =>
        val t2 = times.clone()
        val s2 = advance(stage, t2, r)
        (s2, t2)
      },
      emit = { case (stage, times) =>
        Row.fromSeq(stage +: (0 until k).map(i =>
          if (i < stage) java.lang.Long.valueOf(times(i)) else null))
      })
    // final state per key = the max emitted struct: stage is monotone
    // along the scan and times are frozen once set, so lexicographic
    // max is the last row's state — a map-side-combinable aggregate,
    // no second window
    val reach = scanned.groupBy(keyCol)
      .agg(max(col("__funnel")).as("__f"))
      .select(col(keyCol) +: col("__f.stage").as("stages_reached") +:
        (1 to k).map(i => col(s"__f.step_${i}_us")): _*)
    withKeyUniverse(events, keyCol, timeUsCol, reach, k)
  }

  /** Re-attach keys whose events ALL have null time (the pre-scan
    * isNotNull filter drops them) as stage-0 rows, matching the SQL
    * formulation's distinct-key universe; skipped when the schema
    * proves the time column non-nullable (no row can drop, so the
    * scan already saw every key). The join is the PLAIN equi-join
    * (not null-safe), so a NULL key reports stage 0 — the same
    * convention a SQL `LEFT JOIN ... USING(key)` mirror yields. */
  private[ops] def withKeyUniverse(events: DataFrame, keyCol: String,
      timeUsCol: String, reach: DataFrame, k: Int): DataFrame = {
    if (!events.schema(timeUsCol).nullable) return reach
    val universe = events.select(col(keyCol)).distinct()
    universe.join(reach, Seq(keyCol), "left")
      .select(col(keyCol) +:
        coalesce(col("stages_reached"), lit(0)).as("stages_reached") +:
        (1 to k).map(i => col(s"step_${i}_us")): _*)
  }
}
