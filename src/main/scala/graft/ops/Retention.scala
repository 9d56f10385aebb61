package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention — the classic product-analytics matrix: users
  * bucketed by the week of their FIRST event (the cohort), then for
  * every (cohort, week-offset) the number of cohort members active in
  * that week.
  *
  * Scale shape (fully declarative — Catalyst plans it, every aggregate
  * combines map-side):
  *  1. first-touch per user: one hash aggregate on the user key;
  *  2. distinct (user, week) activity: one hash aggregate — after it,
  *     each user contributes at most one row per week, so the final
  *     count needs no `countDistinct` (no expand, no second shuffle
  *     per distinct);
  *  3. activity ⋈ cohorts on the user key: both sides already hash by
  *     user, and the cohort table is |users|-sized, so this is a plain
  *     shuffle equi-join (NOT broadcast — at 100 TB the user dimension
  *     does not fit);
  *  4. the retention matrix: one last hash aggregate on
  *     (cohort, offset) — tiny output (weeks x weeks).
  * No windows, no skew funnel: a bot user contributes one row per week
  * regardless of its event count, because the distinct step collapses
  * it BEFORE the join.
  *
  * Weeks are Monday-truncated (`date_trunc("week", ...)`, the ISO
  * convention DuckDB shares), so offsets are exact multiples of 7 days
  * and `datediff / 7` is an integer.
  */
object Retention {

  /** Weekly retention matrix: (cohort_week DATE, week_offset INT,
    * n_users BIGINT), one row per cohort-offset with activity.
    * `timeCol` must be a timestamp Column (adapt upstream). */
  def weeklyRetention(events: DataFrame, userCol: String,
      timeCol: Column): DataFrame = {
    val ev = events
      .select(col(userCol), date_trunc("week", timeCol).as("__week"))
      .filter(col("__week").isNotNull)
    val cohorts = ev.groupBy(userCol).agg(min("__week").as("__cohort"))
    val activity = ev.distinct()
    activity.join(cohorts, Seq(userCol))
      .groupBy(col("__cohort").cast("date").as("cohort_week"),
        (datediff(col("__week").cast("date"), col("__cohort").cast("date"))
          / 7).cast("int").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
