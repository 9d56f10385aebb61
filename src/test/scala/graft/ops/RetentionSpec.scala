package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Retention.weeklyRetention: hand-computed cohort matrix, bot-user
  * collapse, and the declarative plan shape. */
class RetentionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Mondays: 2024-01-01, -08, -15
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("hand-computed matrix: two cohorts, gaps, returning users") {
    val ev = Seq(
      // user 1: cohort wk0, active wk0 and wk2 (skips wk1)
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-17 10:00:00")),
      // user 2: cohort wk0, active wk0 only — many events, one row
      (2L, ts("2024-01-03 10:00:00")), (2L, ts("2024-01-04 11:00:00")),
      (2L, ts("2024-01-05 12:00:00")),
      // user 3: cohort wk1, active wk1 and wk2
      (3L, ts("2024-01-09 10:00:00")), (3L, ts("2024-01-16 09:00:00")))
      .toDF("user_id", "t")
    val got = Retention.weeklyRetention(ev, "user_id", col("t"))
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("2024-01-01", 0) -> 2L, // users 1 and 2 in week 0
      ("2024-01-01", 2) -> 1L, // user 1 returns in week 2
      ("2024-01-08", 0) -> 1L, // user 3's cohort week
      ("2024-01-08", 1) -> 1L)) // user 3 returns the next week
  }

  test("a bot user with thousands of events counts once per week") {
    val bot = spark.range(5000).selectExpr("7L as user_id",
      "timestamp '2024-01-01 00:00:00' + make_interval(0,0,0,0,0,id,0) as t")
    val got = Retention.weeklyRetention(bot, "user_id", col("t")).collect()
    assert(got.length == 1 && got.head.getLong(2) == 1L)
  }

  test("day granularity + supplied signup cohorts, incl. NEGATIVE " +
      "offsets for pre-signup activity") {
    val ev = Seq(
      // user 1 signs up Jan 3, active Jan 1 (offset -2), 3 (0), 5 (+2)
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-03 09:00:00")),
      (1L, ts("2024-01-05 23:00:00")),
      // user 2 signs up Jan 3, active Jan 3 and 5
      (2L, ts("2024-01-03 12:00:00")), (2L, ts("2024-01-05 01:00:00")),
      // user 3 has NO signup row: dropped (inner-join semantics)
      (3L, ts("2024-01-04 10:00:00")))
      .toDF("user_id", "t")
    val cohorts = Seq((1L, ts("2024-01-03 17:30:00")),
      (2L, ts("2024-01-03 01:00:00"))).toDF("user_id", "signup")
    val got = Retention.retentionMatrix(ev, "user_id", col("t"),
        granularity = "day", cohorts = Some(cohorts))
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("2024-01-03", -2) -> 1L, // user 1 pre-signup
      ("2024-01-03", 0) -> 2L,  // both active on signup day
      ("2024-01-03", 2) -> 2L)) // both return two days later
  }

  test("month granularity: calendar offsets, not 30-day buckets") {
    val ev = Seq(
      // cohort 2024-01; active Jan 31 and Feb 1 (adjacent days, but
      // DIFFERENT month offsets: 0 and 1) and 2025-03 (offset 14)
      (1L, ts("2024-01-31 10:00:00")), (1L, ts("2024-02-01 00:30:00")),
      (1L, ts("2025-03-15 12:00:00")))
      .toDF("user_id", "t")
    val got = Retention.retentionMatrix(ev, "user_id", col("t"),
        granularity = "month")
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("2024-01-01", 0) -> 1L,
      ("2024-01-01", 1) -> 1L,
      ("2024-01-01", 14) -> 1L))
  }

  test("an unknown granularity and a malformed cohort frame fail fast") {
    val ev = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("user_id", "t")
    val e = intercept[IllegalArgumentException] {
      Retention.retentionMatrix(ev, "user_id", col("t"), "fortnight")
    }
    assert(e.getMessage.contains("granularity"))
    val bad = Seq((1L, ts("2024-01-01 00:00:00"), 1)).toDF("user_id", "s", "x")
    val e2 = intercept[IllegalArgumentException] {
      Retention.retentionMatrix(ev, "user_id", col("t"),
        cohorts = Some(bad))
    }
    assert(e2.getMessage.contains("cohorts"))
  }

  test("plan shape: no window, no cartesian, aggregates partial") {
    val ev = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("user_id", "t")
    val plan = Retention.weeklyRetention(ev, "user_id", col("t"))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("window"))
    assert(!plan.toLowerCase.contains("cartesian"))
    assert(!plan.contains("Expand"), "no countDistinct expand — the " +
      "distinct step makes plain count() exact")
  }
}
