package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention — the classic product-analytics matrix: users
  * bucketed by a cohort period (first touch by default, or a supplied
  * cohort table such as signup date), then for every
  * (cohort, period-offset) the number of cohort members active in that
  * period.
  *
  * Scale shape (fully declarative — Catalyst plans it, every aggregate
  * combines map-side):
  *  1. cohort per user: one hash aggregate on the user key (or the
  *     caller's cohort table, truncated and deduped the same way);
  *  2. distinct (user, period) activity: one hash aggregate — after it,
  *     each user contributes at most one row per period, so the final
  *     count needs no `countDistinct` (no expand, no second shuffle
  *     per distinct);
  *  3. activity ⋈ cohorts on the user key: both sides already hash by
  *     user, and the cohort table is |users|-sized, so this is a plain
  *     shuffle equi-join (NOT broadcast — at 100 TB the user dimension
  *     does not fit);
  *  4. the retention matrix: one last hash aggregate on
  *     (cohort, offset) — tiny output (periods x periods).
  * No windows, no skew funnel: a bot user contributes one row per
  * period regardless of its event count, because the distinct step
  * collapses it BEFORE the join.
  *
  * Periods are `date_trunc` buckets: weeks are Monday-truncated (the
  * ISO convention DuckDB shares) so week offsets are exact `diff/7`
  * integers; month offsets use the calendar formula
  * `(y2-y1)*12 + (m2-m1)` — exact integers on month-truncated dates,
  * unlike float `months_between`, and trivially mirrored in any SQL
  * engine.
  */
object Retention {

  private val Granularities = Seq("day", "week", "month")

  /** Generalized retention matrix: (cohort DATE, offset INT,
    * n_users BIGINT), one row per cohort-offset with activity.
    *
    * @param events      the activity frame
    * @param userCol     user key column name
    * @param timeCol     event-time timestamp Column (adapt upstream)
    * @param granularity "day", "week" (Monday-truncated) or "month"
    * @param cohorts     optional (userCol, cohort-time) frame — e.g.
    *                    signup dates. Cohort times are truncated to the
    *                    granularity and deduped to the user's MINIMUM;
    *                    users absent from it are dropped (inner-join
    *                    semantics, the SQL convention). Default: first
    *                    touch derived from the events themselves.
    *                    Activity before a supplied cohort yields
    *                    NEGATIVE offsets (kept — pre-signup activity is
    *                    a real product signal).
    */
  def retentionMatrix(events: DataFrame, userCol: String, timeCol: Column,
      granularity: String = "week",
      cohorts: Option[DataFrame] = None): DataFrame = {
    require(Granularities.contains(granularity),
      s"granularity must be one of ${Granularities.mkString("/")}, " +
        s"got `$granularity`")
    val ev = events
      .select(col(userCol), date_trunc(granularity, timeCol).as("__bkt"))
      .filter(col("__bkt").isNotNull)
    val coh = cohorts match {
      case None => ev.groupBy(userCol).agg(min("__bkt").as("__cohort"))
      case Some(c) =>
        require(c.columns.length == 2 && c.columns.head == userCol,
          s"cohorts must have exactly ($userCol, <cohort time>) " +
            s"columns, got ${c.columns.toSeq}")
        val cc = c.columns(1)
        c.select(col(userCol),
            date_trunc(granularity, col(cc)).as("__cohort"))
          .filter(col("__cohort").isNotNull)
          .groupBy(userCol).agg(min("__cohort").as("__cohort"))
    }
    val activity = ev.distinct()
    val cohortD = col("__cohort").cast("date")
    val bktD = col("__bkt").cast("date")
    val offset: Column = granularity match {
      case "day" => datediff(bktD, cohortD)
      case "week" => (datediff(bktD, cohortD) / 7).cast("int")
      case "month" =>
        (year(bktD) - year(cohortD)) * lit(12) + (month(bktD) - month(cohortD))
    }
    activity.join(coh, Seq(userCol))
      .groupBy(cohortD.as("cohort"), offset.cast("int").as("offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Weekly first-touch retention matrix: (cohort_week DATE,
    * week_offset INT, n_users BIGINT) — [[retentionMatrix]] at week
    * granularity with the legacy column names. */
  def weeklyRetention(events: DataFrame, userCol: String,
      timeCol: Column): DataFrame =
    retentionMatrix(events, userCol, timeCol, "week", None)
      .select(col("cohort").as("cohort_week"),
        col("offset").as("week_offset"), col("n_users"))
}
