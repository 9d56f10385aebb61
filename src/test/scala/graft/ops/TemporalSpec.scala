package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for Temporal.asofJoin (backward, inclusive). */
class TemporalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def quotes = Seq(
    // key, time, quote_px, quote_id
    ("A", 1L, 10.0, 1L),
    ("A", 5L, 11.0, 2L),
    ("A", 5L, 12.0, 3L), // simultaneous: higher quote_id must win
    ("B", 4L, 20.0, 4L))
    .toDF("sym", "qt", "px", "qid")

  private def trades = Seq(
    ("A", 0L, 100), // before any quote -> null px
    ("A", 1L, 101), // equal time -> inclusive, sees px=10
    ("A", 7L, 102), // after the simultaneous pair -> px=12 (qid 3 wins)
    ("B", 9L, 103),
    ("C", 2L, 104)) // key with no quotes at all -> null px
    .toDF("sym", "tt", "tid")

  private def run() = Temporal.asofJoin(
    trades, quotes, on = Seq("sym"), leftTime = "tt", rightTime = "qt",
    rightVals = Seq("px"), tieBreak = Seq("qid"))
    .orderBy("tid")
    .select("sym", "tt", "tid", "px")
    .collect()
    .map(r => (r.getString(0), r.getLong(1), r.getInt(2),
      Option(r.get(3)).map(_.asInstanceOf[Double])))

  test("backward inclusive semantics, per key") {
    val got = run()
    assert(got(0) == ("A", 0L, 100, None), "no prior quote -> null")
    assert(got(1) == ("A", 1L, 101, Some(10.0)), "equal time is inclusive")
    assert(got(3) == ("B", 9L, 103, Some(20.0)))
    assert(got(4) == ("C", 2L, 104, None), "unseen key -> null")
  }

  test("simultaneous right rows: last by tieBreak wins") {
    assert(run()(2) == ("A", 7L, 102, Some(12.0)))
  }

  test("all left rows and columns survive (left-outer shape)") {
    val out = Temporal.asofJoin(trades, quotes, Seq("sym"), "tt", "qt", Seq("px"))
    assert(out.count() == 5)
    assert(out.columns.toSeq == Seq("sym", "tt", "tid", "px"))
  }

  test("plan contains no join operator and no per-key hash shuffle") {
    // r16: the carry-forward runs through DistRank.perKeyRunningLast,
    // whose ONE range shuffle (mega-key-spreading, see DistRankSpec)
    // lives in the two-pass subjob — the output plan itself must hold
    // neither a join nor a hash exchange on the keys (the old window
    // form's one-task-per-key funnel).
    val out = Temporal.asofJoin(trades, quotes, Seq("sym"), "tt", "qt", Seq("px"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"unexpected join in:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected per-key hash shuffle in:\n$plan")
    assert(!plan.toLowerCase.contains("window"),
      s"unexpected window (one-task-per-key funnel) in:\n$plan")
  }

  test("rightTime itself can be carried as a value column") {
    val q = quotes.withColumn("qt_out", col("qt"))
    val out = Temporal.asofJoin(trades, q, Seq("sym"), "tt", "qt",
      rightVals = Seq("px", "qt_out"), tieBreak = Seq("qid"))
      .filter(col("tid") === 102).collect()
    assert(out.head.getAs[Long]("qt_out") == 5L)
  }

  test("a NULL field in the newest right row does NOT expose a stale older value") {
    // the match must be the fields of ONE right row (the latest), not a
    // per-column blend of the last non-null values across right rows
    val q = Seq(
      ("A", 1L, Some(10.0), 5L),
      ("A", 2L, None, 7L)) // latest row: px is NULL, sz=7
      .toDF("sym", "qt", "px", "qsz")
    val trade = Seq(("A", 3L, 200)).toDF("sym", "tt", "tid")
    val out = Temporal.asofJoin(trade, q, Seq("sym"), "tt", "qt",
      rightVals = Seq("px", "qsz")).collect().head
    assert(out.isNullAt(out.fieldIndex("px")),
      "stale px leaked from an older right row")
    assert(out.getAs[Long]("qsz") == 7L)
  }

  test("composite keys: matches only within the full key tuple") {
    val q = Seq(
      ("A", "x", 1L, 10.0), ("A", "y", 2L, 20.0), ("B", "x", 1L, 30.0))
      .toDF("sym", "venue", "qt", "px")
    val tr = Seq(("A", "x", 5L, 1), ("A", "y", 5L, 2), ("B", "y", 5L, 3))
      .toDF("sym", "venue", "tt", "tid")
    val got = Temporal.asofJoin(tr, q, Seq("sym", "venue"), "tt", "qt", Seq("px"))
      .orderBy("tid").collect()
      .map(r => (r.getInt(r.fieldIndex("tid")),
        Option(r.get(r.fieldIndex("px"))).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq((1, Some(10.0)), (2, Some(20.0)), (3, None)),
      "as-of matched across key-tuple boundaries")
  }

  test("name clash with a left column is rejected") {
    val bad = quotes.withColumnRenamed("px", "tid")
    assertThrows[IllegalArgumentException] {
      Temporal.asofJoin(trades, bad, Seq("sym"), "tt", "qt", Seq("tid"))
    }
  }

  test("right value clashing with an `on` key is rejected with the offender named") {
    // carrying a right column literally named like the join key
    val ex = intercept[IllegalArgumentException] {
      Temporal.asofJoin(trades, quotes, Seq("sym"), "tt", "qt",
        rightVals = Seq("sym"))
    }
    assert(ex.getMessage.contains("sym"))
  }

  test("right value clashing with the left time column is rejected") {
    val bad = quotes.withColumn("tt", col("qt"))
    val ex = intercept[IllegalArgumentException] {
      Temporal.asofJoin(trades, bad, Seq("sym"), "tt", "qt", rightVals = Seq("tt"))
    }
    assert(ex.getMessage.contains("tt"))
  }

  test("reserved internal names (__t/__is_l/__r) are rejected on either side") {
    val badLeft = trades.withColumn("__t", col("tt"))
    assertThrows[IllegalArgumentException] {
      Temporal.asofJoin(badLeft, quotes, Seq("sym"), "tt", "qt", Seq("px"))
    }
    val badRight = quotes.withColumn("__r", col("px"))
    assertThrows[IllegalArgumentException] {
      Temporal.asofJoin(trades, badRight, Seq("sym"), "tt", "qt", Seq("px"))
    }
  }

  private def runFwd() = Temporal.asofJoinForward(
    trades, quotes, on = Seq("sym"), leftTime = "tt", rightTime = "qt",
    rightVals = Seq("px"), tieBreak = Seq("qid"))
    .orderBy("tid")
    .select("sym", "tt", "tid", "px")
    .collect()
    .map(r => (r.getString(0), r.getLong(1), r.getInt(2),
      Option(r.get(3)).map(_.asInstanceOf[Double])))

  test("forward inclusive semantics: earliest right row at or after " +
      "each left time, NULL when none follows") {
    val got = runFwd()
    assert(got(0) == ("A", 0L, 100, Some(10.0)), "next quote is t=1")
    assert(got(1) == ("A", 1L, 101, Some(10.0)), "equal time is inclusive")
    assert(got(2) == ("A", 7L, 102, None), "no quote after t=7 -> null")
    assert(got(3) == ("B", 9L, 103, None), "B's only quote precedes t=9")
    assert(got(4) == ("C", 2L, 104, None), "unseen key -> null")
  }

  test("forward: simultaneous earliest rights resolve by tieBreak " +
      "(last wins), matching the backward convention") {
    val t2 = Seq(("A", 3L, 200)).toDF("sym", "tt", "tid")
    val got = Temporal.asofJoinForward(t2, quotes, Seq("sym"), "tt", "qt",
      rightVals = Seq("px"), tieBreak = Seq("qid")).collect().head
    assert(got.getAs[Double]("px") == 12.0,
      "both t=5 quotes follow t=3; qid=3 must win")
  }

  test("tolerance: stale matches null out, fresh ones survive, " +
      "tolerance 0 keeps only exact-time matches — both directions") {
    val got = Temporal.asofJoin(trades, quotes, Seq("sym"), "tt", "qt",
        rightVals = Seq("px"), tieBreak = Seq("qid"),
        toleranceUs = Some(2L))
      .orderBy("tid").collect()
      .map(r => r.getInt(2) -> Option(r.get(3))).toMap
    // trade 102 at t=7: latest quote t=5 is 2 "us" old -> kept;
    // trade 103 at t=9: quote t=4 is 5 old -> nulled
    assert(got(102).contains(12.0) && got(103).isEmpty)
    assert(got(101).contains(10.0), "distance 0 is within any tolerance")
    val exact = Temporal.asofJoin(trades, quotes, Seq("sym"), "tt", "qt",
        rightVals = Seq("px"), tieBreak = Seq("qid"),
        toleranceUs = Some(0L))
      .orderBy("tid").collect()
      .map(r => r.getInt(2) -> Option(r.get(3))).toMap
    assert(exact(101).contains(10.0) && exact(102).isEmpty)
    // forward: trade 100 at t=0 with tolerance 1 -> quote t=1 kept;
    // tolerance 0 -> nulled (next quote is 1 ahead)
    val fwd = Temporal.asofJoinForward(trades, quotes, Seq("sym"), "tt",
        "qt", rightVals = Seq("px"), tieBreak = Seq("qid"),
        toleranceUs = Some(1L))
      .orderBy("tid").collect()
      .map(r => r.getInt(2) -> Option(r.get(3))).toMap
    assert(fwd(100).contains(10.0))
    assert(fwd(102).isEmpty, "no quote within 1 after t=7")
  }

  test("resampleLocf: dense grid, LOCF carry, null before first obs") {
    val obs = Seq(
      // key A: obs at t=15 and t=42, step 10 -> grid 10,20,30,40
      ("A", 15L, 1.5), ("A", 42L, 4.2),
      // key B: single obs exactly on a grid point
      ("B", 20L, 2.0))
      .toDF("k", "tus", "v").withColumn("ov", col("v"))
    val got = Temporal.resampleLocf(obs, Seq("k"), "tus", 10L,
        carry = Seq("ov"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double]))
      .toMap
    assert(got == Map(
      ("A", 10L) -> None,        // before the first observation
      ("A", 20L) -> Some(1.5),   // t=15 carried forward
      ("A", 30L) -> Some(1.5),   // gap fill
      ("A", 40L) -> Some(1.5),   // t=42 is AFTER this grid point
      ("B", 20L) -> Some(2.0)))  // obs exactly at the point: inclusive
  }

  test("nearest: picks the closer side, backward wins exact ties, " +
      "single-sided rows fall back") {
    val l = Seq((1L, 10L, 100), (1L, 19L, 101), (1L, 2L, 102),
        (1L, 50L, 103))
      .toDF("k", "lt", "lid")
    val r = Seq((1L, 6L, 6.0), (1L, 20L, 20.0), (1L, 14L, 14.0))
      .toDF("k", "rt", "qv")
    val got = Temporal.asofJoinNearest(l, r, Seq("k"), "lt", "rt",
        rightVals = Seq("qv"))
      .collect().map(r => r.getInt(2) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(got(100).contains(6.0),
      "lt=10: backward wins the exact tie (6 and 14 both at distance 4)")
    assert(got(101).contains(20.0), "lt=19: 20 (dist 1) beats 14 (dist 5)")
    assert(got(102).contains(6.0), "lt=2: no backward match, forward 6")
    assert(got(103).contains(20.0), "lt=50: no forward match, backward 20")
  }

  test("nearest: a right row exactly AT the left time matches at " +
      "distance zero; tolerance bounds both directions") {
    val l = Seq((1L, 10L, 1), (1L, 30L, 2), (1L, 60L, 3))
      .toDF("k", "lt", "lid")
    val r = Seq((1L, 10L, 10.0), (1L, 33L, 33.0), (1L, 70L, 70.0))
      .toDF("k", "rt", "qv")
    val got = Temporal.asofJoinNearest(l, r, Seq("k"), "lt", "rt",
        rightVals = Seq("qv"), toleranceUs = Some(5L))
      .collect().map(r => r.getInt(2) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(got(1).contains(10.0), "distance zero")
    assert(got(2).contains(33.0), "forward within tolerance")
    assert(got(3).isEmpty, "nearest (70, dist 10) is beyond tolerance 5")
  }

  test("nearest: simultaneous right rows resolve by tieBreak on both " +
      "sides, and reserved-name clashes fail fast") {
    val l = Seq((1L, 10L, 1)).toDF("k", "lt", "lid")
    val r = Seq((1L, 8L, 1.0, 1L), (1L, 8L, 2.0, 2L), (1L, 13L, 9.0, 3L))
      .toDF("k", "rt", "qv", "qid")
    val got = Temporal.asofJoinNearest(l, r, Seq("k"), "lt", "rt",
        rightVals = Seq("qv"), tieBreak = Seq("qid"))
      .collect().map(r => r.getInt(2) -> r.getDouble(3)).toMap
    assert(got(1) == 2.0,
      "backward dist 2 beats forward dist 3; qid=2 wins the 8-tie")
    val bad = l.withColumnRenamed("lid", "__rb")
    val e = intercept[IllegalArgumentException] {
      Temporal.asofJoinNearest(bad, r, Seq("k"), "lt", "rt", Seq("qv"))
    }
    assert(e.getMessage.contains("__rb"))
  }

  test("resampleLocf: NEGATIVE (pre-1970) epochs floor the grid bounds " +
      "downward, matching floor-division (//) semantics") {
    // min=-7, step 10: floor gives gmin=-10 (truncate-toward-zero would
    // give 0 and lose the -10 point); max=13 -> gmax=10
    val obs = Seq((1L, -7L, 1.0), (1L, 13L, 2.0))
      .toDF("k", "tus", "v").withColumn("ov", col("v"))
    val got = Temporal.resampleLocf(obs, Seq("k"), "tus", 10L,
        carry = Seq("ov"))
      .collect()
      .map(r => r.getLong(1) -> Option(r.get(2)).map(_.asInstanceOf[Double]))
      .toMap
    assert(got == Map(
      -10L -> None,      // grid starts at floor(-7/10)*10 = -10
      0L -> Some(1.0),   // -7 carried forward
      10L -> Some(1.0))) // 13 is after this point
  }

  test("resampleLocf: grids longer than one chunk (65,536 steps) stay " +
      "dense and exact") {
    val obs = Seq((1L, 0L, 10.0), (1L, 70000L, 70.0))
      .toDF("k", "tus", "v").withColumn("ov", col("v"))
    val out = Temporal.resampleLocf(obs, Seq("k"), "tus", 1L,
      carry = Seq("ov"))
    assert(out.count() == 70001L, "one grid point per step, inclusive ends")
    val byT = out.filter(col("grid_us").isin(0L, 65535L, 65536L, 70000L))
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(byT == Map(0L -> 10.0, 65535L -> 10.0, 65536L -> 10.0,
      70000L -> 70.0), "carry must be seamless across the chunk boundary")
  }

  test("forward: timestamp time columns negate through unix_micros") {
    val l = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("k", "lt")
    val r = Seq(
      (1L, java.sql.Timestamp.valueOf("2023-12-31 00:00:00"), 1.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), 2.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), 3.0))
      .toDF("k", "rt", "v")
    val got = Temporal.asofJoinForward(l, r, Seq("k"), "lt", "rt", Seq("v"))
      .collect().head
    assert(got.getAs[Double]("v") == 2.0, "earliest FOLLOWING row wins")
  }
}
