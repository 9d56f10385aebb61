package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the binned large-interval-table joins:
  * Temporal.rangeJoin (point in [lo, hi)) and
  * Temporal.intervalOverlapJoin (interval overlap, exactly-once via
  * the max-start-bin filter). */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // facts: (key, point value, fact id)
  private def facts = Seq(
    ("u1", 0L, 1),    // exactly at an interval's lo -> inclusive
    ("u1", 59L, 2),   // inside
    ("u1", 60L, 3),   // exactly at hi -> exclusive, no match vs [0,60)
    ("u1", 150L, 4),  // inside the second interval, middle bin
    ("u2", 59L, 5),   // other key: must NOT see u1's intervals
    ("u1", -1L, 6),   // negative axis: inside [-60, 0)
    ("u1", 1L, 7)     // inside BOTH [0,60) and [1,2) -> two pairs
  ).toDF("k", "v", "fid")

  private def factsWithNull =
    facts.union(Seq(("u1", null.asInstanceOf[java.lang.Long], 8))
      .toDF("k", "v", "fid").select(col("k"), col("v").cast("long"), col("fid")))

  // intervals: (key, lo, hi, interval id); bin width 10 in the tests,
  // so [100, 200) spans 10 bins and exercises multi-bin explosion
  private def ivs = Seq(
    ("u1", 0L, 60L, 10),
    ("u1", 1L, 2L, 11),
    ("u1", 100L, 200L, 12),
    ("u1", -60L, 0L, 13),
    ("u2", 1000L, 1010L, 14),
    ("u1", 500L, 500L, 15), // empty -> dropped
    ("u1", 700L, 600L, 16)  // inverted -> dropped
  ).toDF("k", "lo", "hi", "iid")

  private def run(f: org.apache.spark.sql.DataFrame =
      factsWithNull): Seq[(Int, Int)] =
    Temporal.rangeJoin(f, ivs, "v", "lo", "hi", binWidth = 10L,
        on = Seq("k"))
      .select("fid", "iid").as[(Int, Int)].collect().toSeq.sorted

  test("half-open containment, per key, multi-bin intervals, negatives") {
    assert(run() == Seq(
      (1, 10),          // v=0 in [0,60): lo inclusive
      (2, 10),          // v=59 in [0,60)
      (4, 12),          // v=150 in the 10-bin interval, middle bin
      (6, 13),          // v=-1 in [-60,0): floor alignment, not truncate
      (7, 10), (7, 11)  // one fact, two covering intervals -> two pairs
    ))
    // absent: fid 3 (v=60 at hi, exclusive), fid 5 (u2 point vs u2's
    // far interval), fid 8 (null v), iids 15/16 (empty/inverted)
  }

  test("interval at the bin-count cap passes; one past it fails loudly") {
    val atCap = Seq(("u1", 0L, 40L, 1)).toDF("k", "lo", "hi", "iid")
    val okay = Temporal.rangeJoin(facts, atCap, "v", "lo", "hi",
      binWidth = 10L, on = Seq("k"), maxBinsPerInterval = 4)
    assert(okay.select("fid").as[Int].collect().toSet == Set(1, 7))
    val past = Seq(("u1", 0L, 41L, 1)).toDF("k", "lo", "hi", "iid")
    val e = intercept[Exception] {
      Temporal.rangeJoin(facts, past, "v", "lo", "hi", binWidth = 10L,
        on = Seq("k"), maxBinsPerInterval = 4).count()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).mkString
    assert(msg.contains("maxBinsPerInterval=4") && msg.contains("[0,41)"),
      s"cap failure must name the offending interval: $msg")
  }

  test("no equi-keys: global interval lookup still works") {
    val iv = Seq((0L, 100L, 1)).toDF("lo", "hi", "iid")
    val f = Seq(50L, 100L, -1L).toDF("v")
    val got = Temporal.rangeJoin(f, iv, "v", "lo", "hi", binWidth = 7L)
      .select("v").as[Long].collect().toSeq
    assert(got == Seq(50L))
  }

  test("guards: non-long range columns, name clashes, reserved names") {
    val dbl = Seq(("u1", 1.0, 2L)).toDF("k", "lo", "hi")
    intercept[IllegalArgumentException] {
      Temporal.rangeJoin(facts, dbl, "v", "lo", "hi", 10L, Seq("k"))
    }
    val clash = ivs.withColumnRenamed("iid", "fid")
    intercept[IllegalArgumentException] {
      Temporal.rangeJoin(facts, clash, "v", "lo", "hi", 10L, Seq("k"))
    }
    intercept[IllegalArgumentException] { // overflow of cap arithmetic
      Temporal.rangeJoin(facts, ivs, "v", "lo", "hi",
        binWidth = Long.MaxValue / 2, on = Seq("k"),
        maxBinsPerInterval = 4)
    }
  }

  test("plan is an equi-join: no nested loop, no cartesian product") {
    val plan = Temporal.rangeJoin(factsWithNull, ivs, "v", "lo", "hi",
      binWidth = 10L, on = Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") &&
      !plan.contains("CartesianProduct"),
      s"range join must lower to an equi-join:\n$plan")
  }

  // ---- intervalOverlapJoin ----

  private def aIvs = Seq(
    ("u1", 0L, 100L, 1),   // overlaps b1 (shares 10 bins) and b2
    ("u1", 100L, 130L, 2), // touches b1 at 100 -> NOT an overlap
    ("u1", 200L, 300L, 3), // disjoint from everything
    ("u2", 0L, 100L, 4),   // other key: no cross-key pairing
    ("u1", -50L, 5L, 5)    // negative axis overlap with b3
  ).toDF("k", "a_lo", "a_hi", "aid")

  private def bIvs = Seq(
    ("u1", 20L, 100L, 21),  // within a1's span, many shared bins
    ("u1", 99L, 101L, 22),  // straddles a1's end AND a2's start
    ("u1", -100L, -40L, 23) // negative-axis overlap with a5
  ).toDF("k", "b_lo", "b_hi", "bid")

  private def overlaps = Temporal.intervalOverlapJoin(aIvs, bIvs,
      "a_lo", "a_hi", "b_lo", "b_hi", binWidth = 10L, on = Seq("k"))
    .select("aid", "bid").as[(Int, Int)].collect().toSeq.sorted

  test("overlap pairs appear EXACTLY once despite many shared bins") {
    assert(overlaps == Seq(
      (1, 21), // 10 shared bins -> still one output row
      (1, 22), // straddling overlap
      (2, 22), // [100,130) x [99,101): overlap at [100,101)
      (5, 23)  // negative coordinates
    ))
    // absent: (2,21) touch at 100 (half-open: no overlap), a3/a4
  }

  test("overlap join with no keys and asymmetric bin coverage") {
    val a = Seq((0L, 1000L, 1)).toDF("a_lo", "a_hi", "aid")
    val b = Seq((999L, 2000L, 2), (1000L, 3000L, 3)).toDF("b_lo", "b_hi", "bid")
    val got = Temporal.intervalOverlapJoin(a, b, "a_lo", "a_hi",
        "b_lo", "b_hi", binWidth = 100L)
      .select("aid", "bid").as[(Int, Int)].collect().toSeq.sorted
    assert(got == Seq((1, 2)))
  }

  // ---- mergeIntervals ----

  private def merged(rows: Seq[(String, Long, Long)]) =
    Temporal.mergeIntervals(rows.toDF("k", "lo", "hi"), "k", "lo", "hi")
      .select("k", "lo", "hi", "n_merged")
      .as[(String, Long, Long, Long)].collect().toSeq.sorted

  test("mergeIntervals: overlap, half-open touch, disjoint gap, and a " +
      "LONG interval bridging later short ones (the non-lag case)") {
    val got = merged(Seq(
      ("u", 0L, 10L), ("u", 5L, 15L),   // overlap -> one island
      ("u", 15L, 20L),                  // touches: hi==lo merges
      ("u", 30L, 100L),                 // long interval...
      ("u", 40L, 45L), ("u", 50L, 55L), // ...bridges these two
      ("u", 200L, 210L),                // genuinely disjoint
      ("v", 12L, 14L)))                 // other key: isolated
    assert(got == Seq(
      ("u", 0L, 20L, 3L),
      ("u", 30L, 100L, 3L),
      ("u", 200L, 210L, 1L),
      ("v", 12L, 14L, 1L)))
  }

  test("timeWeightedAverage: hand-computed bucket splits, duplicate " +
      "times (last wins), hold cap, last-observation horizon") {
    // key u: v=10 at t=0 (with an earlier zero-length duplicate v=99),
    // v=20 at t=90; bucket 60, maxHold 120 -> last obs holds [90, 210)
    val obs = Seq(
      ("u", 0L, 99.0, 1L), ("u", 0L, 10.0, 2L), // dup: tb=2 wins
      ("u", 90L, 20.0, 3L),
      ("g", 0L, 7.0, 4L), ("g", 1000L, 9.0, 5L) // gap > cap: hold capped
    ).toDF("k", "t", "v", "tb")
    val got = Temporal.timeWeightedAverage(obs, "k", "t", "v",
        bucketUs = 60L, maxHoldUs = 120L, tieBreak = Seq("tb"))
      .select("k", "bucket_us", "dur_us", "twa")
      .as[(String, Long, Long, Double)].collect().toSeq.sorted
    assert(got == Seq(
      ("g", 0L, 60L, 7.0), ("g", 60L, 60L, 7.0),  // capped hold [0,120)
      // last obs holds [1000, 1120) across aligned bins 960/1020/1080
      ("g", 960L, 20L, 9.0), ("g", 1020L, 60L, 9.0),
      ("g", 1080L, 40L, 9.0),
      ("u", 0L, 60L, 10.0),
      ("u", 60L, 60L, 15.0), // 30us of 10 + 30us of 20
      ("u", 120L, 60L, 20.0),
      ("u", 180L, 30L, 20.0)).sorted)
  }

  test("mergeIntervals: duplicate intervals after a gap stay in their " +
      "own island under ANY partitioning (the flag-tie order bug)") {
    // [0,10) then two copies of [100,110): the duplicates leave the
    // running-max scan with flags 1 and 0 — if the island sum's order
    // ever put the flag-0 twin first, it would join the PREVIOUS
    // island across the 10..100 gap
    val rows = Seq(("u", 0L, 10L), ("u", 100L, 110L), ("u", 100L, 110L))
    Seq(1, 3, 7).foreach { parts =>
      val df = rows.toDF("k", "lo", "hi").repartition(parts)
      val got = Temporal.mergeIntervals(df, "k", "lo", "hi")
        .select("k", "lo", "hi", "n_merged")
        .as[(String, Long, Long, Long)].collect().toSeq.sorted
      assert(got == Seq(("u", 0L, 10L, 1L), ("u", 100L, 110L, 2L)),
        s"parts=$parts: $got")
    }
  }

  test("mergeIntervals: duplicates count in n_merged; null-ended and " +
      "empty intervals drop; all-dropped key is absent") {
    val rows = Seq(("u", 1L, 5L), ("u", 1L, 5L), ("w", 9L, 9L))
    val extra = Seq(("w", Option.empty[Long], Option(4L)))
      .toDF("k", "lo", "hi")
      .select(col("k"), col("lo").cast("long"), col("hi").cast("long"))
    val df = rows.toDF("k", "lo", "hi").union(extra)
    val got = Temporal.mergeIntervals(df, "k", "lo", "hi")
      .select("k", "lo", "hi", "n_merged")
      .as[(String, Long, Long, Long)].collect().toSeq.sorted
    assert(got == Seq(("u", 1L, 5L, 2L)))
  }
}
