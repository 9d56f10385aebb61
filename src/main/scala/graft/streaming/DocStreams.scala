package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.text.TextOps

/** Streaming corpus hygiene — document-side twins of the batch curation
  * operators, for ingesting training data as it arrives rather than in
  * periodic batch sweeps. Both are pure plan transforms over a
  * streaming DataFrame, so they compose with any source/sink and with
  * each other (dedup first, then decontaminate).
  */
object DocStreams {

  /** Online near-duplicate drop: a document whose 64-bit SimHash equals
    * one already seen inside the watermark horizon is discarded — the
    * streaming twin of the batch signature-identity stage of
    * [[graft.text.TextOps.simhashNearDupPairs]] (exact-signature match;
    * for Hamming-tolerant matching run the batch verifier over the
    * survivors periodically).
    *
    * The signature width matters for the FALSE-POSITIVE direction: with
    * 16 bits, unrelated documents collide by the birthday bound at a few
    * hundred docs per horizon and get silently dropped; at 64 bits an
    * accidental same-signature pair needs ~2^32 docs in the horizon, and
    * near-identical token multisets that genuinely share all 64 sign
    * bits are exactly the near-duplicates this stage exists to drop.
    *
    * Scale shape: the signature is computed per row with the scalar
    * [[graft.text.TextOps.simhash64Col]] (no aggregation state), and
    * dropDuplicatesWithinWatermark keeps one state row per distinct
    * signature inside the horizon — memory tracks the horizon's
    * signature cardinality, not the stream's length. */
  def dedupBySimhash(docs: DataFrame, textCol: String,
      eventTimeCol: String, watermark: String = "2 hours"): DataFrame =
    docs
      .withColumn("__sh64", TextOps.simhash64Col(col(textCol)))
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("__sh64"))
      .drop("__sh64")

  /** One exploded LSH band row: (bucket, ts, id, text). */
  case class BandRow(bucket: String, ts: java.sql.Timestamp, id: Long,
      text: String)

  /** A claim emitted by [[BucketClaimProcessor]]: the (ts, id)-minimal
    * document that first claimed a band bucket, with its payload. */
  case class ClaimRow(ts: java.sql.Timestamp, id: Long, text: String)

  /** Per-bucket claim state for [[dedupByMinhash]]: the FIRST document
    * (smallest (ts, id) across the batch's rows — deterministic, so a
    * document either claims consistently across all its bands or not
    * at all) to reach an unclaimed bucket claims it and is emitted;
    * everyone else arriving while the claim lives is silently absorbed.
    * The claim expires via an event-time timer `horizonMs` after its
    * event time, bounding state to the horizon's bucket cardinality —
    * dropDuplicatesWithinWatermark's memory shape, with the claim
    * ordering dropDuplicates cannot promise. */
  private class BucketClaimProcessor(horizonMs: Long)
      extends StatefulProcessor[String, BandRow, ClaimRow] {
    @transient private var claim: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      claim = getHandle.getValueState[Long]("claim", Encoders.scalaLong,
        TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[BandRow],
        timers: TimerValues): Iterator[ClaimRow] = {
      if (claim.exists() || !rows.hasNext) Iterator.empty
      else {
        val first = rows.minBy(r => (r.ts.getTime, r.id))
        claim.update(first.ts.getTime)
        getHandle.registerTimer(first.ts.getTime + horizonMs)
        Iterator.single(ClaimRow(first.ts, first.id, first.text))
      }
    }
    override def handleExpiredTimer(key: String, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[ClaimRow] = {
      claim.clear()
      Iterator.empty
    }
  }

  /** Online MinHash/LSH near-duplicate drop — the streaming twin of the
    * batch minhashSignature -> lshBuckets -> candidate-pairs ->
    * [[graft.text.TextOps.dropNearDuplicates]] chain: a document
    * survives iff it claims ALL of its k/rows band buckets first;
    * sharing even one live bucket with an earlier document absorbs it
    * into that document's cluster. Dropped documents still hold their
    * claimed buckets, so chains propagate transitively exactly like the
    * batch connected components (A keeps, B shares a band with A and is
    * dropped, C shares only B's other band and is still dropped).
    *
    * The per-document signature is computed NARROWLY — each band hash
    * is an array_min over the row's own shingle array with the exact
    * md5-half arithmetic of the batch [[graft.text.TextOps
    * .minhashFromShingles]], so no aggregation state exists outside the
    * bucket claims. Documents with fewer than `shingleWords` tokens get
    * per-document unique buckets and always survive (the batch chain
    * never pairs them either). Claims expire `claimHorizonMs` after
    * their event time (state ~ horizon bucket cardinality, evicted by
    * event-time timers); the downstream per-document count aggregation
    * is watermark-bounded the same way, so survivors emit once the
    * watermark passes their event time.
    *
    * Batch-parity contract: with arrival order = id order, the survivor
    * set equals the batch chain's whenever no LATER document bridges
    * two already-distinct earlier clusters (the one decision an online
    * pass cannot retroactively revise); near-identical duplicate groups
    * — the case near-dedup exists for — never bridge, and the spec
    * pins stream == batch on exactly that corpus shape.
    *
    * Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass` ->
    * `...RocksDBStateStoreProvider`), the transformWithState backend. */
  def dedupByMinhash(docs: DataFrame, idCol: String, textCol: String,
      eventTimeCol: String, k: Int = 8, rows: Int = 2,
      shingleWords: Int = 3, watermark: String = "2 hours",
      claimHorizonMs: Long = 2L * 3600 * 1000): DataFrame = {
    val (banded, nBands) = bandedRows(docs, idCol, textCol, eventTimeCol,
      k, rows, shingleWords, watermark)
    claimSurvivors(banded, nBands, claimHorizonMs,
      idCol, textCol, eventTimeCol)
  }

  /** The streaming twin of [[graft.text.TextOps.dedupAgainstCorpus]] —
    * continuous ingest against an already-curated corpus: each arriving
    * document's LSH band buckets are checked against the STATIC index
    * of the corpus's buckets (a stream-static anti join: any band hit
    * drops the document, the batch operator's `clash` semantics), and
    * the survivors then near-dedup among THEMSELVES through the same
    * per-bucket first-claim state [[dedupByMinhash]] uses. Emits the
    * surviving (idCol, textCol, eventTimeCol) rows.
    *
    * `indexBuckets` carries a `bucket` column from
    * [[graft.text.TextOps.lshBuckets]] over the curated corpus — the
    * same frame the batch operator consumes, so a job can flip between
    * sweep and stream without rebuilding the index. Re-index by
    * restarting the query over the refreshed static frame (static
    * sides are re-planned per run, not per microbatch).
    *
    * Documented divergence from the batch operator, in the
    * CONSERVATIVE direction only: a corpus-clashed document's
    * non-clashing buckets still claim within the horizon, so a stream
    * document that near-duplicates a clashed one is also dropped —
    * the batch chain keeps it (its only candidate pair was removed
    * with the clashed doc). The streaming behavior is the
    * dedup-safe call: such a document transitively near-duplicates
    * corpus content through the clashed doc. No document the batch
    * operator DROPS is ever kept here.
    *
    * Scale shape: the anti join shuffles band rows against the
    * index's distinct buckets (corpus-bounded, never corpus x stream),
    * and the claim state holds one entry per live bucket inside the
    * horizon — the within-stream stage never materializes candidate
    * pairs at all, which is the streaming answer to the batch chain's
    * hot-bucket discipline. */
  def dedupAgainstCorpus(docs: DataFrame, indexBuckets: DataFrame,
      idCol: String, textCol: String, eventTimeCol: String,
      k: Int = 8, rows: Int = 2, shingleWords: Int = 3,
      watermark: String = "2 hours",
      claimHorizonMs: Long = 2L * 3600 * 1000): DataFrame = {
    val (banded, nBands) = bandedRows(docs, idCol, textCol, eventTimeCol,
      k, rows, shingleWords, watermark)
    val idx = indexBuckets.select(col("bucket")).distinct()
    val spark = docs.sparkSession
    import spark.implicits._
    // a document with ANY band bucket in the corpus index loses that
    // band row here and can never reach the nBands claim count below
    val fresh = banded.toDF()
      .join(idx, Seq("bucket"), "left_anti").as[BandRow]
    claimSurvivors(fresh, nBands, claimHorizonMs,
      idCol, textCol, eventTimeCol)
  }

  /** Shared banding stage: minhash the stream, explode one bucket row
    * per band (u-prefixed unique buckets for shingle-less docs, as in
    * the batch [[graft.text.TextOps.lshBuckets]]). Returns the banded
    * rows and the band count. */
  private def bandedRows(docs: DataFrame, idCol: String, textCol: String,
      eventTimeCol: String, k: Int, rows: Int, shingleWords: Int,
      watermark: String): (org.apache.spark.sql.Dataset[BandRow], Int) = {
    require(k % 2 == 0, "k must be even (two 60-bit halves per md5)")
    require(rows > 0 && k % rows == 0, s"k=$k must divide into bands of $rows")
    val nBands = k / rows
    val base = docs.select(col(idCol).cast("long").as("id"),
        col(textCol).cast("string").as("text"),
        col(eventTimeCol).cast("timestamp").as("ts"))
      .withWatermark("ts", watermark)
    val hashes = (0 until k).map { i =>
      val j = i / 2
      val start = if (i % 2 == 0) 1 else 17
      array_min(transform(col("__shs"), s =>
        conv(substring(md5(concat(lit(s"$j:"), s)), start, 15), 16, 10)
          .cast("long")))
    }
    val withH = base
      .withColumn("__shs", TextOps.shinglesOf(col("text"), shingleWords))
      .select(col("id") +: col("text") +: col("ts") +:
        (0 until k).map(i => hashes(i).as(s"__h$i")): _*)
    val bands = (0 until nBands).map { b =>
      val cs = (b * rows until (b + 1) * rows)
        .map(i => col(s"__h$i").cast("string"))
      when(col("__h0").isNull,
        concat(lit(s"u$b:"), col("id").cast("string")))
        .otherwise(md5(concat_ws(":", (lit(s"b$b") +: cs): _*)))
    }
    val spark = docs.sparkSession
    import spark.implicits._
    val banded = withH.withColumn("bucket", explode(array(bands: _*)))
      .select("bucket", "ts", "id", "text").as[BandRow]
    (banded, nBands)
  }

  /** Shared claim stage: per-bucket first-claim state, then keep the
    * documents that claimed ALL their bands. Package-visible so
    * [[MediaStreams.dedupByEnvelopeBanded]] can ride the SAME state
    * machine with envelope bands as buckets (its `text` slot carries
    * the fingerprint, stringified — the claim state never looks inside
    * the payload column). */
  private[streaming] def claimSurvivors(
      banded: org.apache.spark.sql.Dataset[BandRow], nBands: Int,
      claimHorizonMs: Long, idCol: String, textCol: String,
      eventTimeCol: String): DataFrame = {
    val spark = banded.sparkSession
    import spark.implicits._
    val claims = banded.groupByKey(_.bucket)
      .transformWithState(new BucketClaimProcessor(claimHorizonMs),
        "ts", OutputMode.Append())
    claims.toDF()
      .groupBy(col("ts"), col("id"), col("text"))
      .agg(count(lit(1)).as("__claimed"))
      .filter(col("__claimed") === nBands)
      .select(col("id").as(idCol), col("text").as(textCol),
        col("ts").as(eventTimeCol))
  }

  /** One exploded paragraph row for [[scrubParagraphs]]: key = md5 of
    * the trimmed paragraph (bounds state-key size; a 128-bit collision
    * is negligible at any corpus scale). */
  case class ParRow(key: String, ts: java.sql.Timestamp, id: Long,
      pos: Int, par: String)

  /** Per-paragraph verdict: the input row plus whether THIS occurrence
    * holds the corpus-wide first claim. */
  case class ParOut(ts: java.sql.Timestamp, id: Long, pos: Int,
      par: String, kept: Boolean)

  /** Paragraph-claim state for [[scrubParagraphs]]: the first (ts, id,
    * pos) occurrence of a paragraph claims it and is kept; every later
    * occurrence — same batch or later — is emitted kept=false. Claims
    * expire `horizonMs` after their event time ([[BucketClaimProcessor]]'s
    * memory shape: state ~ the horizon's distinct-paragraph count). */
  private class ParagraphClaimProcessor(horizonMs: Long)
      extends StatefulProcessor[String, ParRow, ParOut] {
    @transient private var claim: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      claim = getHandle.getValueState[Long]("claim", Encoders.scalaLong,
        TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[ParRow],
        timers: TimerValues): Iterator[ParOut] = {
      val rs = rows.toSeq
      if (rs.isEmpty) Iterator.empty
      else if (claim.exists())
        rs.iterator.map(r => ParOut(r.ts, r.id, r.pos, r.par, kept = false))
      else {
        val first = rs.minBy(r => (r.ts.getTime, r.id, r.pos))
        claim.update(first.ts.getTime)
        getHandle.registerTimer(first.ts.getTime + horizonMs)
        rs.iterator.map(r => ParOut(r.ts, r.id, r.pos, r.par,
          kept = r.ts.getTime == first.ts.getTime && r.id == first.id &&
            r.pos == first.pos))
      }
    }
    override def handleExpiredTimer(key: String, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[ParOut] = {
      claim.clear()
      Iterator.empty
    }
  }

  /** Online paragraph-level exact dedup — the streaming twin of
    * [[graft.text.TextOps.dedupParagraphs]] for scrubbing boilerplate
    * at ingest: each document's paragraphs claim their first-occurrence
    * slots; paragraphs already claimed inside the horizon (by an
    * earlier document OR an earlier position of this one) are removed,
    * and the document is re-emitted from its surviving paragraphs once
    * the watermark passes its event time. Output matches the batch
    * operator — (idCol, n_paragraphs, n_kept, text_dedup) — plus the
    * event-time column; documents with no non-empty paragraph emit no
    * row.
    *
    * Batch-parity contract: first-claim-wins IS the batch rule, so
    * with arrival order consistent with (ts, id) the streamed output
    * equals the batch frame exactly (no bridging caveat — unlike
    * [[dedupByMinhash]], paragraph identity is not transitive). State
    * is one claim per distinct paragraph in the horizon, evicted by
    * event-time timers; the reassembly aggregation is
    * watermark-bounded the same way. Requires the RocksDB state store
    * provider (transformWithState backend). */
  def scrubParagraphs(docs: DataFrame, idCol: String, textCol: String,
      eventTimeCol: String, sep: String = "\n\n",
      watermark: String = "2 hours",
      claimHorizonMs: Long = 2L * 3600 * 1000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col(idCol).cast("long").as("id"),
        col(textCol).cast("string").as("text"),
        col(eventTimeCol).cast("timestamp").as("ts"))
      .withWatermark("ts", watermark)
    val pars = base
      .select(col("id"), col("ts"),
        posexplode(split(coalesce(col("text"), lit("")),
          java.util.regex.Pattern.quote(sep))))
      .select(md5(trim(col("col"))).as("key"), col("ts"), col("id"),
        col("pos"), trim(col("col")).as("par"))
      .filter(col("par") =!= "")
      .as[ParRow]
    val verdicts = pars.groupByKey(_.key)
      .transformWithState(new ParagraphClaimProcessor(claimHorizonMs),
        "ts", OutputMode.Append())
    verdicts.toDF()
      .groupBy(col("ts"), col("id"))
      .agg(count(lit(1)).as("n_paragraphs"),
        sum(col("kept").cast("long")).as("n_kept"),
        concat_ws(sep,
          transform(
            array_sort(collect_list(
              when(col("kept"), struct(col("pos"), col("par"))))),
            s => s.getField("par"))).as("text_dedup"))
      .select(col("id").as(idCol), col("n_paragraphs"), col("n_kept"),
        col("text_dedup"), col("ts").as(eventTimeCol))
  }

  /** Streaming test-set decontamination: drop any incoming document
    * sharing at least one n-word shingle with the static benchmark
    * frame — the streaming twin of [[graft.text.TextOps.decontaminate]].
    *
    * Implemented as a STATELESS stream-static LEFT ANTI join on
    * `array_contains(doc_shingles, bench_shingle)`: the benchmark side
    * is bounded (an eval suite), so it broadcasts, and a document
    * survives only when no benchmark shingle occurs in its shingle
    * array. Each micro-batch costs |batch| x |bench shingles| contains
    * probes — fine for eval-suite-sized benchmark sets; for very large
    * ones run the batch operator's equi-join form over accumulated
    * data instead. */
  def decontaminate(docs: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, shingleWords: Int = 13): DataFrame = {
    val bs = TextOps.explodedShingles(bench, idCol, textCol, shingleWords)
      .select(col("sh").as("__bench_sh")).distinct()
    docs
      .withColumn("__shs", TextOps.shinglesOf(col(textCol), shingleWords))
      .join(broadcast(bs), array_contains(col("__shs"), col("__bench_sh")),
        "left_anti")
      .drop("__shs")
  }

  /** Streaming SEMANTIC decontamination: drop any incoming document
    * whose embedding's 4-dp rounded cosine similarity to ANY vector of
    * the static benchmark frame reaches `minCosine` — the streaming
    * twin of [[graft.sim.Similarity.semanticDecontaminate]], and the
    * similarity-tier sibling of [[decontaminate]] above (paraphrased /
    * reformatted eval leakage that shingle overlap structurally
    * misses).
    *
    * Implemented as a STATELESS stream-static LEFT ANTI theta-join on
    * the rounded-cosine threshold: the benchmark side is eval-suite
    * sized by contract, so it broadcasts, and a document survives only
    * when no benchmark vector clears the threshold. Each micro-batch
    * costs |batch| x |bench| narrow Dot-kernel products — the batch
    * operator's exact arithmetic (same kernel, same 4-dp rounding), so
    * stream survivors equal batch survivors row-for-row (spec-pinned).
    * The static side is re-planned per run, not per micro-batch:
    * refresh the benchmark by restarting the query over the new frame,
    * [[dedupAgainstCorpus]]'s re-index contract. */
  def semanticDecontaminate(docs: DataFrame, bench: DataFrame,
      vecCol: String, minCosine: Double,
      maxBench: Int = 100000): DataFrame = {
    // the batch twin's guards, enforced at plan time (bench is a
    // STATIC frame, so the count is a legal one-off action here):
    // broadcasting an unbounded "benchmark" would OOM every micro-batch
    require(minCosine > 0 && minCosine <= 1,
      s"minCosine must be in (0, 1], got $minCosine")
    val nB = bench.limit(maxBench + 1).count()
    require(nB <= maxBench,
      s"streaming semanticDecontaminate broadcasts the benchmark; it " +
        s"exceeds maxBench=$maxBench — pre-bucket with srpCandidates")
    val b = bench.select(col(vecCol).cast("array<double>").as("__bv"))
    docs.join(broadcast(b),
      round(graft.sim.Similarity.cosine(
        col(vecCol).cast("array<double>"), col("__bv")), 4) >= minCosine,
      "left_anti")
  }

  /** Domain-diversity monitoring on a live ingest stream — the
    * streaming twin of t93's batch composition: canonicalize each
    * URL ([[graft.text.UrlOps.canonicalizeUrls]] — a narrow cascade
    * whose PSL probe is a codegen'd kernel, so it runs unchanged on a
    * streaming frame), drop unparseable rows, and maintain per-source
    * HLL registers over the registrable domain. A complete-mode
    * aggregate whose state is bounded at |sources| x 2^p register
    * rows regardless of stream length (max(rho) is
    * duplicate-insensitive, so `dedupTerms = false` — no distinct
    * pass, identical registers). Feed the output to
    * [[TextOps.hllEstimate]] for the distinct-domain estimates; the
    * spec asserts stream == batch register parity bit-for-bit. */
  def domainDiversityRegisters(docs: DataFrame, idCol: String,
      urlCol: String, sourceCol: String, p: Int = 8): DataFrame = {
    val canon = graft.text.UrlOps.canonicalizeUrls(docs, idCol, urlCol)
      .filter(col("domain").isNotNull)
    TextOps.hllRegisters(canon.select(col(sourceCol), col("domain")),
      sourceCol, col("domain"), p, dedupTerms = false)
  }

  /** Cross-source content-overlap monitoring on a live ingest stream —
    * the streaming twin of t105's batch composition: 3-word shingles
    * into per-source one-permutation MinHash registers
    * ([[TextOps.minhashRegisters]] — min is duplicate-insensitive, so
    * the whole thing is ONE complete-mode aggregate with state bounded
    * at |sources| × k rows; the shingle explode ahead of it is
    * stateless). Feed the output to
    * [[TextOps.minhashRegisterOverlap]] for the pairwise Jaccard
    * estimates — "did source X start mirroring source Y mid-stream?";
    * the spec asserts stream == batch register parity bit-for-bit. */
  def sourceOverlapRegisters(docs: DataFrame, textCol: String,
      sourceCol: String, k: Int = 128): DataFrame =
    TextOps.minhashRegisters(
      docs.select(col(sourceCol),
        explode(TextOps.shinglesOf(col(textCol), 3)).as("__sh")),
      sourceCol, col("__sh"), k)
}
