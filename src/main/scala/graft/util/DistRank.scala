package graft.util

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Skew-proof per-key `row_number`: the drop-in replacement for
  * `Window.partitionBy(key).orderBy(...)` when one key can hold an
  * unbounded share of the rows. A bare window funnels each key through
  * ONE task — the skew trap the r13/r14 rounds removed from the LSH
  * kernel and stratifiedSample; this removes it from full-ordering
  * ranks, where a threshold prefilter cannot help because every
  * surviving row needs its exact rank (e.g. [[graft.sim.Similarity
  * .prototypePrune]]'s prototypicality order).
  *
  * Mechanism (the classic distributed ranking construction):
  *  1. `repartitionByRange` + `sortWithinPartitions` on
  *     (key, orderCols...) — a TOTAL order split across partitions by
  *     sampled range bounds, so a mega-key spreads over MANY
  *     partitions instead of one task.
  *  2. One pass counts each partition's per-key run lengths. Because
  *     the data is range-sorted, a partition holds at most
  *     (#keys-crossing-it) runs and the whole count table is bounded
  *     by #partitions + #distinct-keys rows — collected to the driver
  *     (the k-row contract) and turned into per-(partition, key)
  *     starting offsets.
  *  3. A second pass assigns rank = offset + local running index.
  *
  * Rank values are EXACT and deterministic regardless of where the
  * sampled range bounds fall, provided (key, orderCols...) is a total
  * order (include a unique tiebreaker, as every caller here does) —
  * correctness never depends on the sampler. Two narrow passes over
  * the sorted shuffle output are the price for flat max-task; the
  * shuffle itself is the same one the window needed.
  */
object DistRank {

  /** Append `rankCol` (1-based LongType per-key row number) to `df`,
    * ranked within `keyCol` by `orderCols` (which must totally order
    * rows within a key — include a unique tiebreaker). */
  def perKeyRowNumber(df: DataFrame, keyCol: String, orderCols: Seq[Column],
      rankCol: String): DataFrame =
    twoPass(df, keyCol, orderCols, rankCol, _ => 1L)

  /** Skew-proof per-key INCLUSIVE running sum of a long column — the
    * same two-pass construction for `sum(value) over (partition by key
    * order by ... rows unbounded preceding)` shapes (sequence packing's
    * per-source cumulative token totals, where one mega-source would
    * single-task a plain window). Appends `outCol` = the running total
    * INCLUDING the current row. NULL values contribute 0 (the window
    * sum's null tolerance); `orderCols` must totally order rows within
    * a key. */
  def perKeyRunningSum(df: DataFrame, keyCol: String,
      orderCols: Seq[Column], valueCol: String, outCol: String): DataFrame = {
    val valIdx = df.columns.indexOf(valueCol)
    require(valIdx >= 0, s"value column $valueCol not in ${df.columns.toSeq}")
    twoPass(df, keyCol, orderCols, outCol,
      r => if (r.isNullAt(valIdx)) 0L else r.getLong(valIdx))
  }

  /** The shared two-pass core: range-partition + partition-local sort
    * on (key, orderCols...), count each partition's per-key increment
    * totals (bounded by #partitions + #keys rows, collected), turn
    * them into per-(partition, key) starting offsets, then assign
    * `offset + running increment` in a second pass over the REUSED
    * shuffle (Spark skips the completed exchange map stage, so only
    * the cheap partition-local sort re-runs — no corpus-sized cache).
    * `inc` reads the per-row increment from the PRE-SHUFFLE column
    * order, which both passes observe identically. */
  private def twoPass(df: DataFrame, keyCol: String, orderCols: Seq[Column],
      outCol: String, inc: Row => Long): DataFrame = {
    val spark = df.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sortExprs = col(keyCol) +: orderCols
    val sorted = df.repartitionByRange(nPart, sortExprs: _*)
      .sortWithinPartitions(sortExprs: _*)
    val keyIdx = sorted.columns.indexOf(keyCol)
    require(keyIdx >= 0, s"key column $keyCol not in ${sorted.columns.toSeq}")
    val rdd = sorted.rdd
    // pass 1: per-partition, per-key increment totals (range-sorted ->
    // contiguous runs; table size <= #partitions + #keys)
    val runs: Array[(Int, Any, Long)] = rdd.mapPartitionsWithIndex {
      (pid, it) =>
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Any, Long)]
        var curKey: Any = null
        var started = false
        var acc = 0L
        it.foreach { r =>
          val k = r.get(keyIdx)
          if (!started || k != curKey) {
            if (started) buf += ((pid, curKey, acc))
            curKey = k; acc = 0L; started = true
          }
          acc += inc(r)
        }
        if (started) buf += ((pid, curKey, acc))
        buf.iterator
    }.collect()
    // per-(partition, key) starting offsets: sum of the same key's
    // totals in earlier partitions
    val offsets: Map[(Int, Any), Long] = runs
      .groupBy(_._2)
      .iterator.flatMap { case (k, rs) =>
        val byPid = rs.sortBy(_._1)
        var acc = 0L
        byPid.map { case (pid, _, t) =>
          val o = ((pid, k), acc); acc += t; o
        }
      }.toMap
    // pass 2: assign out = offset + running increment
    val withOut = rdd.mapPartitionsWithIndex { (pid, it) =>
      var curKey: Any = null
      var started = false
      var acc = 0L
      it.map { r =>
        val k = r.get(keyIdx)
        if (!started || k != curKey) {
          curKey = k; started = true
          acc = offsets.getOrElse((pid, k), 0L)
        }
        acc += inc(r)
        Row.fromSeq(r.toSeq :+ acc)
      }
    }
    val schema = StructType(sorted.schema.fields :+
      StructField(outCol, LongType, nullable = false))
    spark.createDataFrame(withOut, schema)
  }
}
