package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
