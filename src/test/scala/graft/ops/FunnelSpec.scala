package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Funnel.matchSteps: greedy earliest-advance semantics with strict
  * time progression, exactness against a driver-side reference, and
  * the mega-key spread posture. */
class FunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: (Long, Long, String, Double)*) =
    rows.toDF("user_id", "tus", "etype", "value")

  private def steps = Seq(
    col("etype") === "click",
    col("etype") === "purchase",
    col("etype") === "purchase" && col("value") > 50)

  private def run(df: org.apache.spark.sql.DataFrame) =
    Funnel.matchSteps(df, "user_id", "tus", steps)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1),
        (2 to 4).map(i => Option(r.get(i)).map(_.asInstanceOf[Long])))))
      .toMap

  test("hand-computed reach: strict progression, unreached -> nulls") {
    val got = run(ev(
      // user 1: full funnel
      (1L, 10L, "click", 0.0), (1L, 20L, "purchase", 10.0),
      (1L, 30L, "purchase", 99.0),
      // user 2: purchase BEFORE the first click never counts
      (2L, 5L, "purchase", 99.0), (2L, 10L, "click", 0.0),
      // user 3: nothing matches step 1
      (3L, 1L, "purchase", 99.0)))
    assert(got(1L) == ((3, Seq(Some(10L), Some(20L), Some(30L)))))
    assert(got(2L) == ((1, Seq(Some(10L), None, None))))
    assert(got(3L) == ((0, Seq(None, None, None))))
  }

  test("strictness: an equal-time event cannot advance the next step, " +
      "and one event never satisfies two steps") {
    val got = run(ev(
      // user 1: purchase at the SAME instant as the click -> step 2
      // must wait for the later purchase
      (1L, 10L, "click", 0.0), (1L, 10L, "purchase", 99.0),
      (1L, 20L, "purchase", 10.0),
      // user 2: ONE purchase(99) matches both step 2 and step 3 — it
      // advances step 2 only; step 3 needs a strictly later event
      (2L, 1L, "click", 0.0), (2L, 2L, "purchase", 99.0)))
    assert(got(1L) == ((2, Seq(Some(10L), Some(20L), None))),
      "equal-time purchase must not advance; later one must")
    assert(got(2L) == ((2, Seq(Some(1L), Some(2L), None))),
      "a single event must not double-count for steps 2 and 3")
  }

  test("greedy earliest-advance: the first qualifying event advances " +
      "even when a later one would too") {
    val got = run(ev(
      (1L, 1L, "click", 0.0), (1L, 2L, "purchase", 1.0),
      (1L, 3L, "purchase", 99.0)))
    assert(got(1L) == ((3, Seq(Some(1L), Some(2L), Some(3L)))),
      "step 2 takes the t=2 purchase, leaving t=3 for step 3")
  }

  test("input order independence and real-data agreement with a " +
      "driver-side reference") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("tus"),
        col("event_type").as("etype"), col("value"))
    val got = run(events)
    val got2 = run(events.repartition(13).sortWithinPartitions(desc("tus")))
    assert(got == got2, "result must not depend on input partitioning")
    // driver-side layered-min reference
    val byUser = events.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .groupBy(_._1)
    val preds = Seq[(String, Double) => Boolean](
      (e, _) => e == "click", (e, _) => e == "purchase",
      (e, v) => e == "purchase" && v > 50)
    val want = byUser.map { case (u, es) =>
      var prev = Long.MinValue
      var stage = 0
      val times = Array.fill(3)(Option.empty[Long])
      var advanced = true
      while (stage < 3 && advanced) {
        val nxt = es.filter(e => preds(stage)(e._3, e._4) &&
          (stage == 0 || e._2 > prev)).map(_._2).minOption
        advanced = nxt.isDefined
        nxt.foreach { t => times(stage) = Some(t); prev = t; stage += 1 }
      }
      u -> ((stage, times.toSeq))
    }
    assert(got.size == want.size)
    want.foreach { case (u, w) =>
      assert(got(u) == w, s"user $u: got ${got(u)}, want $w")
    }
  }

  test("a key whose events ALL have null time still gets a stage-0 row " +
      "(the SQL distinct-key universe)") {
    val df = Seq(
      (1L, Some(10L), "click", 0.0), (1L, Some(20L), "purchase", 99.0),
      // user 2: only null-time events — must still appear with stage 0
      (2L, None, "click", 0.0), (2L, None, "purchase", 99.0),
      // user 3: a null-time click is IGNORED; the timed purchase can't
      // open the funnel
      (3L, None, "click", 0.0), (3L, Some(5L), "purchase", 99.0))
      .toDF("user_id", "tus", "etype", "value")
    val got = run(df)
    assert(got(1L) == ((2, Seq(Some(10L), Some(20L), None))))
    assert(got(2L) == ((0, Seq(None, None, None))),
      "all-null-time keys must report stage 0, not vanish")
    assert(got(3L) == ((0, Seq(None, None, None))))
  }

  private def runW(df: org.apache.spark.sql.DataFrame, w: Long) =
    Funnel.matchStepsWindowed(df, "user_id", "tus", steps, w)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1),
        (2 to 4).map(i => Option(r.get(i)).map(_.asInstanceOf[Long])))))
      .toMap

  test("windowed: an expired funnel RE-ARMS from a fresher step-1 event") {
    // W=10: the t=0 click can't convert (purchase at 100 is too late),
    // but the t=95 click can — the greedy single chain would miss it
    val got = runW(ev(
      (1L, 0L, "click", 0.0), (1L, 95L, "click", 0.0),
      (1L, 100L, "purchase", 99.0),
      // user 2: the SAME events without the second click: stage 1 only
      (2L, 0L, "click", 0.0), (2L, 100L, "purchase", 99.0)), 10L)
    assert(got(1L) == ((2, Seq(Some(0L), Some(100L), None))),
      "re-arm: earliest step-1 is still t=0, conversion via the t=95 anchor")
    assert(got(2L) == ((1, Seq(Some(0L), None, None))),
      "without a fresh anchor the window binds")
  }

  test("windowed: the deadline anchors at step 1, not the previous step, " +
      "and a fresher anchor carried at level 2 unlocks level 3") {
    val got = runW(ev(
      // user 1: click@0 -> purchase@8 ok, but p50@12 breaches 12-0>10
      (1L, 0L, "click", 0.0), (1L, 8L, "purchase", 1.0),
      (1L, 12L, "purchase", 99.0),
      // user 2: same + a click@5 whose chain (5 -> 8 -> 12) completes
      (2L, 0L, "click", 0.0), (2L, 5L, "click", 0.0),
      (2L, 8L, "purchase", 1.0), (2L, 12L, "purchase", 99.0)), 10L)
    assert(got(1L) == ((2, Seq(Some(0L), Some(8L), None))),
      "window measured from the anchor must block level 3")
    assert(got(2L) == ((3, Seq(Some(0L), Some(8L), Some(12L)))),
      "the max-anchor chain at level 2 (anchor 5) must be retained")
  }

  test("windowed: strictness survives — same-instant events never chain, " +
      "window bound is inclusive") {
    val got = runW(ev(
      // user 1: click and purchase at the same instant: no chain
      (1L, 10L, "click", 0.0), (1L, 10L, "purchase", 99.0),
      // user 2: exactly AT the window bound (20-10 == 10): inclusive
      (2L, 10L, "click", 0.0), (2L, 20L, "purchase", 99.0),
      // user 3: one past the bound
      (3L, 10L, "click", 0.0), (3L, 21L, "purchase", 99.0)), 10L)
    assert(got(1L)._1 == 1)
    assert(got(2L) == ((2, Seq(Some(10L), Some(20L), None))))
    assert(got(3L)._1 == 1)
  }

  test("windowed: step times are the earliest reach of EACH level, " +
      "possibly from different chains") {
    // chain A (anchor 0) reaches level 2 at t=5 but never level 3;
    // chain B (anchor 50) completes at t=60. er_2 = 5 from chain A.
    val got = runW(ev(
      (1L, 0L, "click", 0.0), (1L, 5L, "purchase", 1.0),
      (1L, 50L, "click", 0.0), (1L, 55L, "purchase", 1.0),
      (1L, 60L, "purchase", 99.0)), 10L)
    assert(got(1L) == ((3, Seq(Some(0L), Some(5L), Some(60L)))))
  }

  /** Independent driver-side reference: per-anchor greedy layered-min
    * under the window, reach = max over anchors, step times = min per
    * level over anchors. */
  private def windowedReference(
      es: Seq[(Long, Long, String, Double)], w: Long,
      preds: Seq[(String, Double) => Boolean])
      : Map[Long, (Int, Seq[Option[Long]])] = {
    val k = preds.size
    es.groupBy(_._1).map { case (u, evs) =>
      val anchors = evs.filter(e => preds(0)(e._3, e._4)).map(_._2)
      val er = Array.fill(k)(Option.empty[Long])
      var reach = 0
      anchors.foreach { a =>
        var prev = a
        var stage = 1
        er(0) = Some(er(0).fold(a)(math.min(_, a)))
        var advanced = true
        while (stage < k && advanced) {
          val nxt = evs.filter(e => preds(stage)(e._3, e._4) &&
            e._2 > prev && e._2 - a <= w).map(_._2).minOption
          advanced = nxt.isDefined
          nxt.foreach { t =>
            er(stage) = Some(er(stage).fold(t)(math.min(_, t)))
            prev = t; stage += 1
          }
        }
        reach = math.max(reach, stage)
      }
      u -> ((if (anchors.isEmpty) 0 else reach, er.toSeq))
    }
  }

  test("windowed: agreement with the per-anchor layered-min reference " +
      "on real data, light and heavy paths identical") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("tus"),
        col("event_type").as("etype"), col("value"))
    val w = 6L * 3600L * 1000000L // 6 hours
    val light = runW(events, w)
    // force EVERY key through the bucketed heavy branch
    spark.conf.set("spark.graft.skew.heavyKeyRows", "1")
    graft.util.DistRank.clearKeyCountCache()
    val heavy = try runW(events, w)
      finally spark.conf.unset("spark.graft.skew.heavyKeyRows")
    assert(light == heavy,
      "bucketed lookback replay must equal the single-task fold")
    val preds = Seq[(String, Double) => Boolean](
      (e, _) => e == "click", (e, _) => e == "purchase",
      (e, v) => e == "purchase" && v > 50)
    val rows = events.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val want = windowedReference(rows.toSeq, w, preds)
    assert(light.size == want.size)
    want.foreach { case (u, wv) =>
      assert(light(u) == wv, s"user $u: got ${light(u)}, want $wv")
    }
  }

  test("windowed: tiny window forces many buckets on the heavy path and " +
      "stays exact across bucket boundaries") {
    // events every 3 us, window 10 -> buckets of 10 us, chains
    // regularly straddle the boundary
    val n = 2000
    val df = spark.range(n).selectExpr("7L as user_id", "id * 3 as tus",
      """CASE WHEN id % 5 = 0 THEN 'click'
         WHEN id % 5 = 2 THEN 'purchase' ELSE 'view' END as etype""",
      "cast(CASE WHEN id % 10 = 7 THEN 99 ELSE 1 END as double) as value")
    val light = runW(df, 10L)
    spark.conf.set("spark.graft.skew.heavyKeyRows", "100")
    graft.util.DistRank.clearKeyCountCache()
    val heavy = try runW(df, 10L)
      finally spark.conf.unset("spark.graft.skew.heavyKeyRows")
    assert(light == heavy)
    val rows = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val preds = Seq[(String, Double) => Boolean](
      (e, _) => e == "click", (e, _) => e == "purchase",
      (e, v) => e == "purchase" && v > 50)
    val want = windowedReference(rows.toSeq, 10L, preds)
    assert(light(7L) == want(7L), s"got ${light(7L)}, want ${want(7L)}")
  }

  test("windowed: all-null-time keys still report stage 0") {
    val df = Seq(
      (1L, Some(10L), "click", 0.0), (1L, Some(12L), "purchase", 99.0),
      (2L, None, "click", 0.0))
      .toDF("user_id", "tus", "etype", "value")
    val got = Funnel.matchStepsWindowed(df, "user_id", "tus", steps, 10L)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 2, 2L -> 0))
  }

  test("one mega-key spreads over several partitions") {
    val n = 60000
    val df = spark.range(n).selectExpr("0L as user_id", "id as tus",
      """CASE WHEN id % 3 = 0 THEN 'click' ELSE 'purchase' END as etype""",
      "cast(id % 100 as double) as value")
    // force the single key through the HEAVY branch (default threshold
    // is 2M rows — this corpus is all one key, the shape under test)
    spark.conf.set("spark.graft.skew.heavyKeyRows", "1000")
    val out = try Funnel.matchSteps(df, "user_id", "tus", steps)
      finally spark.conf.unset("spark.graft.skew.heavyKeyRows")
    assert(out.count() == 1)
    val r = out.collect().head
    assert(r.getInt(1) == 3)
    // posture: the scan's shuffle spreads the single key
    val scanPart = df
      .repartitionByRange(32, col("user_id"), col("tus"))
      .rdd.mapPartitions(it => Iterator.single(it.size)).collect()
    assert(scanPart.count(_ > 0) > 1,
      s"one key must span partitions: ${scanPart.toSeq}")
  }
}
