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
