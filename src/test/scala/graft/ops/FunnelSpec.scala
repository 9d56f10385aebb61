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
