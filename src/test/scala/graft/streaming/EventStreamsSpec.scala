package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Streaming parity: the streaming windowed agg over the events parquet
  * must equal the batch formulation; sessionization streaming vs batch. */
class EventStreamsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  def eventsBatch = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
  }

  /** FileStreamSource requires a directory; stage the single parquet. */
  lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("streaming windowed agg equals batch windowed agg") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = eventsBatch.schema
    val stream = spark.readStream.schema(schema).parquet(streamDir)
    val q = EventStreams.windowedAgg(stream)
      .writeStream.outputMode("append").format("memory").queryName("win_agg")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // append mode only emits closed windows (watermark passed); compare
    // those rows against the batch result restricted to the same windows.
    val got = spark.table("win_agg")
      .select(col("window.start").as("ws"), col("event_type"), col("n"),
        round(col("total_value"), 4).as("tv"))
    val want = EventStreams.windowedAgg(eventsBatch)
      .select(col("window.start").as("ws"), col("event_type"), col("n"),
        round(col("total_value"), 4).as("tv"))
    assert(got.count() > 0, "streaming emitted no closed windows")
    assert(got.exceptAll(want).count() == 0,
      "streaming rows not found in batch result")
  }

  test("streaming dedup within watermark emits exactly the batch-distinct keys") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = eventsBatch.schema
    val stream = spark.readStream.schema(schema).parquet(streamDir)
    val q = EventStreams.dedupWithinWatermark(stream, Seq("user_id", "event_type"))
      .writeStream.outputMode("append").format("memory").queryName("dedup")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("dedup").select("user_id", "event_type")
    val want = eventsBatch.select("user_id", "event_type").distinct()
    assert(got.count() == want.count(), "one row per distinct key")
    assert(got.distinct().count() == got.count(), "no duplicate keys emitted")
    assert(got.exceptAll(want).count() == 0, "emitted keys are batch keys")
  }

  test("streaming sliding-window activity equals batch (q12 twin)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = eventsBatch.schema
    val stream = spark.readStream.schema(schema).parquet(streamDir)
    val q = EventStreams.slidingUserActivity(stream)
      .writeStream.outputMode("append").format("memory").queryName("slide")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("slide")
      .select(col("window.start").as("ws"), col("user_id"), col("n_events"),
        round(col("total_value"), 4).as("tv"))
    val want = EventStreams.slidingUserActivity(eventsBatch)
      .select(col("window.start").as("ws"), col("user_id"), col("n_events"),
        round(col("total_value"), 4).as("tv"))
    assert(got.count() > 0, "streaming emitted no closed sliding windows")
    assert(got.exceptAll(want).count() == 0,
      "streaming sliding windows not found in batch result")
  }

  test("streaming as-of enrichment matches the batch as-of join") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = eventsBatch.schema
    val stream = spark.readStream.schema(schema).parquet(streamDir)
    val q = EventStreams.asofEnrichStream(stream)
      .writeStream.outputMode("append").format("memory").queryName("asof")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("asof")
      .select(col("user_id"), col("event_id"), col("left_ts"),
        round(col("left_value"), 4).as("lv"), col("right_ts"),
        round(col("right_value"), 4).as("rv"))
    // batch twin over the same parquet, through the generic operator
    val ev = EventStreams.withEventTime(eventsBatch)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        col("event_time").as("left_ts"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_time").as("ct"),
        col("event_time").as("right_ts"), col("value").as("right_value"),
        col("event_id").as("click_id"))
    val want = graft.ops.Temporal.asofJoin(purchases, clicks,
        on = Seq("user_id"), leftTime = "left_ts", rightTime = "ct",
        rightVals = Seq("right_ts", "right_value"),
        tieBreak = Seq("click_id"))
      .select(col("user_id"), col("event_id"), col("left_ts"),
        round(col("value"), 4).as("lv"), col("right_ts"),
        round(col("right_value"), 4).as("rv"))
    assert(got.count() > 0, "no enriched rows emitted")
    assert(got.exceptAll(want).count() == 0,
      "streaming enrichment disagrees with the batch as-of join")
  }

  test("streaming sessionization matches batch sessionization") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = eventsBatch.schema
    val stream = spark.readStream.schema(schema).parquet(streamDir)
    val q = EventStreams.sessionize(stream)
      .writeStream.outputMode("append").format("memory").queryName("sess")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("sess")
      .select(col("user_id"), col("session_start"), col("n_events"),
        round(col("total_value"), 4).as("tv"))
    val want = EventStreams.sessionizeBatch(eventsBatch)
      .select(col("user_id"), col("session_start"), col("n_events"),
        round(col("total_value"), 4).as("tv"))
    assert(got.count() > 0, "no sessions emitted")
    assert(got.exceptAll(want).count() == 0,
      "streaming sessions not found in batch result")
  }

  test("eventTime adapts to every ts encoding the testdata has shipped") {
    import spark.implicits._
    // the same instant three ways: epoch-nanos Long, TIMESTAMP (micros,
    // instant-semantics), TIMESTAMP_NTZ — the encodings events.ts has
    // actually arrived in across testdata regenerations. r7 lost the
    // whole temporal surface (bench crash + 5 dropped oracle rows) to
    // an unannounced nanos->micros flip; this pins the adaptive read.
    val us = 1700000123456789L
    val asLong = Seq((1L, us * 1000L)).toDF("event_id", "ts")
    val asTs = Seq((1L, java.time.Instant.EPOCH.plusNanos(us * 1000L)))
      .toDF("event_id", "ts")
    val asNtz = asTs.select(col("event_id"),
      col("ts").cast(org.apache.spark.sql.types.TimestampNTZType).as("ts"))
    val got = Seq(asLong, asTs, asNtz).map { df =>
      val out = EventStreams.withEventTime(df)
      assert(out.schema("event_time").dataType ==
        org.apache.spark.sql.types.TimestampType,
        s"event_time must be TIMESTAMP for input ${df.schema("ts").dataType}")
      out.select("event_time").as[java.time.Instant].head()
    }
    assert(got.distinct.size == 1,
      s"all three encodings must yield the same instant, got $got")
    assert(got.head == java.time.Instant.EPOCH.plusNanos(us * 1000L))
  }

  test("asofEnrichStream idle TTL reclaims the sealed right; default keeps it forever") {
    import spark.implicits._
    // Spark 4.1 moved MemoryStream under execution.streaming.runtime
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    def h(n: Long): Long = n * 3600L * 1000000000L // hours -> ns (raw ts unit)

    // Drives the same 7-batch scenario against both configs: user 1
    // clicks at 1h and purchases at 2h (enriched normally), then goes
    // quiet while user 2 keep-alives advance the watermark far past the
    // 1h idle TTL, then user 1 purchases again at 30h. With the TTL the
    // sealed click was reclaimed -> NULL enrichment; without it the
    // click persists and still matches.
    def run(ttlMs: Long, name: String): Map[Long, Option[Double]] = {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in = MemoryStream[(Long, Long, String, Double, Long)]
      val events = in.toDF.toDF("event_id", "user_id", "event_type", "value", "ts")
      val q = EventStreams.asofEnrichStream(events, idleStateTtlMs = ttlMs)
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      def step(rows: (Long, Long, String, Double, Long)*): Unit = {
        in.addData(rows: _*); q.processAllAvailable()
      }
      step((10L, 1L, "click", 5.0, h(1)), (11L, 1L, "purchase", 1.0, h(2)))
      step((20L, 2L, "click", 9.0, h(10))) // after: wm 8h
      // during this batch wm=8h: user 1's pending purchase emits (click
      // matched) and, with TTL, the idle timer arms at wm + 1h = 9h
      step((21L, 2L, "click", 9.0, h(30))) // after: wm 28h
      // during this batch wm=28h > 9h: user 1 times out with no data ->
      // TTL path removes the sealed click (no-TTL run: no timer, no-op)
      step((22L, 2L, "click", 9.0, h(31)))
      step((12L, 1L, "purchase", 2.0, h(30))) // late purchase, >= wm 29h
      step((23L, 2L, "click", 9.0, h(40)))
      step((24L, 2L, "click", 9.0, h(50))) // wm 38h -> 30h purchase emits
      q.stop()
      spark.table(name).collect().map { r =>
        r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Double]("right_value")).map(_.doubleValue())
      }.toMap
    }

    val kept = run(0L, "asof_ttl_off")
    assert(kept(11L).contains(5.0), "normal enrichment broken (no-TTL run)")
    assert(kept(12L).contains(5.0),
      "without a TTL the sealed right must persist indefinitely")
    val ttl = run(3600000L, "asof_ttl_on")
    assert(ttl(11L).contains(5.0), "normal enrichment broken (TTL run)")
    assert(ttl(12L).isEmpty,
      "after idleStateTtlMs of inactivity the sealed right must be dropped")
  }

  test("streaming funnel transitions are exactly a prefix of the batch " +
      "funnel reach (q26 twin)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val steps = Seq(col("event_type") === "click",
      col("event_type") === "purchase",
      col("event_type") === "purchase" && col("value") > 50)
    val schema = eventsBatch.schema
    val stream = spark.readStream.schema(schema).parquet(streamDir)
    val q = EventStreams.funnelStream(stream, steps)
      .toDF()
      .writeStream.outputMode("append").format("memory").queryName("funnel")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("funnel")
      .select(col("user_id"), col("stage"),
        unix_micros(col("reached_at").cast("timestamp")).as("tus"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got.nonEmpty, "no funnel transitions emitted")
    // batch reach on the same parquet
    val ev0 = eventsBatch
    val evB = ev0.withColumn("tus",
      unix_micros(EventStreams.eventTime(ev0)))
    val batch = graft.ops.Funnel.matchSteps(evB, "user_id", "tus", steps)
      .collect().flatMap { r =>
        (1 to r.getInt(1)).map(i => (r.getLong(0), i, r.getLong(1 + i)))
      }.toSet
    assert(got.subsetOf(batch),
      s"stream emitted transitions the batch funnel does not have: " +
        s"${(got -- batch).take(3)}")
    // per user the emitted stages are a PREFIX (1..m with no holes)
    got.groupBy(_._1).foreach { case (u, ts) =>
      val stages = ts.map(_._2).toSeq.sorted
      assert(stages == (1 to stages.max), s"user $u stages with holes: $stages")
    }
  }

  test("streaming retention hits aggregate to exactly the batch " +
      "retention matrix (q28 twin)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = eventsBatch.schema
    val stream = spark.readStream.schema(schema).parquet(streamDir)
    val q = EventStreams.retentionHitsStream(stream, granularity = "week")
      .toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("ret_hits")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val hits = spark.table("ret_hits")
    // exactly-once per (user, cohort, offset)
    assert(hits.count() ==
      hits.select("user_id", "cohort", "offset").distinct().count())
    val got = hits.groupBy("cohort", "offset")
      .agg(count(lit(1)).as("n_users"))
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    val ev0 = eventsBatch
    val want = graft.ops.Retention
      .weeklyRetention(ev0, "user_id", EventStreams.eventTime(ev0))
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    // the stream cannot emit hits for events still inside the final
    // watermark horizon; with AvailableNow the final watermark passes
    // everything except the trailing horizon, so compare on the sealed
    // prefix: every streamed cell must match the batch cell exactly,
    // and the batch total must not be exceeded
    assert(got.nonEmpty, "no retention hits emitted")
    got.foreach { case (cell, n) =>
      assert(want.contains(cell), s"stream invented cell $cell")
      assert(n <= want(cell), s"cell $cell: stream $n > batch ${want(cell)}")
    }
    // cells fully sealed (cohort + offset weeks entirely below the
    // final watermark horizon) must match exactly; with this data the
    // horizon (2h) clips at most the last week's cells
    val lastWeek = want.keys.map(_._1).max
    got.collect { case ((c, o), n) if c < lastWeek && {
        // the activity week of the cell
        val actW = java.time.LocalDate.parse(c).plusDays(7L * o)
        actW.toString < lastWeek
      } => ((c, o), n)
    }.foreach { case (cell, n) =>
      assert(n == want(cell), s"sealed cell $cell: stream $n != batch ${want(cell)}")
    }
  }

  test("WINDOWED streaming funnel transitions are exactly a prefix of " +
      "the windowed batch reach (q31 twin), incl. re-arm across batches") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val steps = Seq(col("event_type") === "click",
      col("event_type") === "purchase",
      col("event_type") === "purchase" && col("value") > 50)
    val w = 6L * 3600L * 1000000L
    val schema = eventsBatch.schema
    val stream = spark.readStream.schema(schema).parquet(streamDir)
    val q = EventStreams.funnelStream(stream, steps, windowUs = Some(w))
      .toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_w")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("funnel_w")
      .select(col("user_id"), col("stage"),
        unix_micros(col("reached_at").cast("timestamp")).as("tus"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got.nonEmpty, "no windowed funnel transitions emitted")
    val ev0 = eventsBatch
    val evB = ev0.withColumn("tus",
      unix_micros(EventStreams.eventTime(ev0)))
    val batchRows = graft.ops.Funnel
      .matchStepsWindowed(evB, "user_id", "tus", steps, w)
      .collect()
    val batch = batchRows.flatMap { r =>
      (1 to r.getInt(1)).map(i => (r.getLong(0), i, r.getLong(1 + i)))
    }.toSet
    assert(got.subsetOf(batch),
      s"stream emitted transitions the windowed batch funnel does not " +
        s"have: ${(got -- batch).take(3)}")
    got.groupBy(_._1).foreach { case (u, ts) =>
      val stages = ts.map(_._2).toSeq.sorted
      assert(stages == (1 to stages.max), s"user $u stages with holes: $stages")
    }
    // the window must BIND somewhere: some user's windowed reach is
    // strictly below their unwindowed reach (otherwise this spec
    // proves nothing about the deadline)
    val unwindowed = graft.ops.Funnel
      .matchSteps(evB, "user_id", "tus", steps)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val windowedReach = batchRows.map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(windowedReach.exists { case (u, s) => s < unwindowed(u) },
      "expected at least one user whose funnel the 6h deadline cuts short")
  }

  test("streaming transition hits are exactly the batch lag pairs on " +
      "the sealed prefix (q34 twin)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = eventsBatch.schema
    val stream = spark.readStream.schema(schema).parquet(streamDir)
    val q = EventStreams.transitionHitsStream(stream, "event_type")
      .toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("trans_hits")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val hitRows = spark.table("trans_hits")
      .select(col("user_id"), col("from_state"), col("to_state"),
        unix_micros(col("at").cast("timestamp")).as("tus"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(hitRows.nonEmpty, "no transition hits emitted")
    // exactly-once: the TO event identifies a pair uniquely here
    // (event times are unique per user in this data)
    assert(hitRows.distinct.length == hitRows.length,
      "duplicate transition hits emitted")
    // batch pairs at event granularity via the same de-skewed lag
    val ev0 = eventsBatch
    val ev = ev0.select(col("event_id"), col("user_id"),
      unix_micros(EventStreams.eventTime(ev0)).as("tus"), col("event_type"))
    val batch = graft.util.DistRank.perKeyLag(ev, "user_id",
        Seq(col("tus"), col("event_id")), "event_type", "prev")
      .filter(col("prev").isNotNull)
      .select(col("user_id"), col("prev"), col("event_type"), col("tus"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    val got = hitRows.toSet
    assert(got.subsetOf(batch),
      s"stream emitted pairs the batch lag does not have: " +
        s"${(got -- batch).take(3)}")
    // everything whose TO event is strictly below the final watermark
    // (max event time minus the 2h horizon, ms-truncated as the
    // watermark is) MUST have been emitted — the sealed prefix is exact
    val maxTus = ev.agg(max("tus")).head.getLong(0)
    val sealedUs = (maxTus / 1000L - 2L * 3600 * 1000) * 1000L
    val sealedBatch = batch.filter(_._4 < sealedUs)
    assert(sealedBatch.subsetOf(got),
      s"sealed pairs missing from the stream: ${(sealedBatch -- got).take(3)}")
  }

  test("streaming interval coalescing emits exactly the batch islands " +
      "sealed below the final watermark, each once (q43 twin)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def ivs(df: org.apache.spark.sql.DataFrame) = {
      val tus = unix_micros(EventStreams.eventTime(df))
      df.select(col("user_id"), tus.as("lo"),
        (tus + (lit(1L) + pmod(col("event_id"), lit(50L))) *
          lit(60000000L)).as("hi"))
    }
    val schema = eventsBatch.schema
    val stream = spark.readStream.schema(schema).parquet(streamDir)
    val q = EventStreams.mergeIntervalsStream(ivs(stream),
        "user_id", "lo", "hi").toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("merge_ivs")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("merge_ivs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty, "no islands emitted")
    assert(got.distinct.length == got.length, "island emitted twice")
    val batch = graft.ops.Temporal.mergeIntervals(ivs(eventsBatch),
        "user_id", "lo", "hi")
      .select("user_id", "lo", "hi", "n_merged").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got.toSet.subsetOf(batch),
      s"stream islands absent from batch: ${(got.toSet -- batch).take(3)}")
    // everything final below the run's final watermark MUST be out
    val maxTus = ivs(eventsBatch).agg(max("lo")).head.getLong(0)
    val wmUs = (maxTus / 1000L - 2L * 3600 * 1000) * 1000L
    val sealedBatch = batch.filter(_._3 < wmUs)
    assert(sealedBatch.subsetOf(got.toSet),
      s"sealed islands missing: ${(sealedBatch -- got.toSet).take(3)}")
  }

  test("stream-static range enrichment equals the batch rangeJoin " +
      "exactly (stateless q37 twin)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // static validity-interval dimension: 60s windows after each error
    val ev0 = eventsBatch
    val wins = ev0.filter(col("event_type") === "error")
      .select(col("user_id"),
        unix_micros(EventStreams.eventTime(ev0)).as("lo"),
        (unix_micros(EventStreams.eventTime(ev0)) + lit(60000000L)).as("hi"))
    val schema = eventsBatch.schema
    val stream = spark.readStream.schema(schema).parquet(streamDir)
    val q = EventStreams.rangeEnrichStream(stream, wins, "lo", "hi",
        on = Seq("user_id"), binWidth = 60000000L)
      .select("event_id", "lo")
      .writeStream.outputMode("append").format("memory")
      .queryName("range_enrich")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("range_enrich").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    // the batch operator on identical inputs — stateless join, so the
    // stream must emit EXACTLY the batch pairs (no prefix carve-out)
    val facts = EventStreams.withEventTime(ev0)
      .withColumn("tus", unix_micros(col("event_time")))
    val want = graft.ops.Temporal.rangeJoin(facts, wins, "tus",
        "lo", "hi", binWidth = 60000000L, on = Seq("user_id"))
      .select("event_id", "lo").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(want.nonEmpty, "batch twin matched nothing — test data moved")
    assert(got == want,
      s"stream/batch mismatch: stream ${got.size} vs batch ${want.size}")
  }
}
