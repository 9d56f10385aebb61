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
      rankCol: String): DataFrame = {
    val spark = df.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sortExprs = col(keyCol) +: orderCols
    val sorted = df.repartitionByRange(nPart, sortExprs: _*)
      .sortWithinPartitions(sortExprs: _*)
    val keyIdx = sorted.columns.indexOf(keyCol)
    require(keyIdx >= 0, s"key column $keyCol not in ${sorted.columns.toSeq}")

    // Two jobs over the same lineage: the range-exchange map stage is
    // computed once and REUSED via its shuffle files on the second job
    // (Spark skips completed shuffle-map stages), so only the cheap
    // partition-local sort re-runs — no cache of corpus-sized data.
    val rdd = sorted.rdd
    // pass 1: per-partition, per-key run lengths (range-sorted ->
    // contiguous runs; table size <= #partitions + #keys)
    val runs: Array[(Int, Any, Long)] = rdd.mapPartitionsWithIndex {
      (pid, it) =>
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Any, Long)]
        var curKey: Any = null
        var started = false
        var n = 0L
        it.foreach { r =>
          val k = r.get(keyIdx)
          if (!started || k != curKey) {
            if (started) buf += ((pid, curKey, n))
            curKey = k; n = 0L; started = true
          }
          n += 1
        }
        if (started) buf += ((pid, curKey, n))
        buf.iterator
    }.collect()
    // per-(partition, key) starting offsets: sum of the same key's run
    // lengths in earlier partitions
    val offsets: Map[(Int, Any), Long] = runs
      .groupBy(_._2)
      .iterator.flatMap { case (k, rs) =>
        val byPid = rs.sortBy(_._1)
        var acc = 0L
        byPid.map { case (pid, _, n) =>
          val o = ((pid, k), acc); acc += n; o
        }
      }.toMap

    // pass 2: assign rank = offset + local running index
    val withRank = rdd.mapPartitionsWithIndex { (pid, it) =>
      var curKey: Any = null
      var started = false
      var next = 0L
      it.map { r =>
        val k = r.get(keyIdx)
        if (!started || k != curKey) {
          curKey = k; started = true
          next = offsets.getOrElse((pid, k), 0L)
        }
        next += 1L
        Row.fromSeq(r.toSeq :+ next)
      }
    }
    val schema = StructType(sorted.schema.fields :+
      StructField(rankCol, LongType, nullable = false))
    spark.createDataFrame(withRank, schema)
  }

  /** Skew-proof per-key INCLUSIVE running sum of a long column — the
    * same two-pass construction as [[perKeyRowNumber]] for
    * `sum(value) over (partition by key order by ... rows unbounded
    * preceding)` shapes (sequence packing's per-source cumulative
    * token totals, where one mega-source would single-task a plain
    * window). Appends `outCol` = the running total INCLUDING the
    * current row. `orderCols` must totally order rows within a key. */
  def perKeyRunningSum(df: DataFrame, keyCol: String,
      orderCols: Seq[Column], valueCol: String, outCol: String): DataFrame = {
    val spark = df.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sortExprs = col(keyCol) +: orderCols
    val sorted = df.repartitionByRange(nPart, sortExprs: _*)
      .sortWithinPartitions(sortExprs: _*)
    val keyIdx = sorted.columns.indexOf(keyCol)
    val valIdx = sorted.columns.indexOf(valueCol)
    require(keyIdx >= 0 && valIdx >= 0,
      s"need $keyCol and $valueCol in ${sorted.columns.toSeq}")
    val rdd = sorted.rdd
    val runs: Array[(Int, Any, Long)] = rdd.mapPartitionsWithIndex {
      (pid, it) =>
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Any, Long)]
        var curKey: Any = null
        var started = false
        var s = 0L
        it.foreach { r =>
          val k = r.get(keyIdx)
          if (!started || k != curKey) {
            if (started) buf += ((pid, curKey, s))
            curKey = k; s = 0L; started = true
          }
          s += r.getLong(valIdx)
        }
        if (started) buf += ((pid, curKey, s))
        buf.iterator
    }.collect()
    val offsets: Map[(Int, Any), Long] = runs
      .groupBy(_._2)
      .iterator.flatMap { case (k, rs) =>
        val byPid = rs.sortBy(_._1)
        var acc = 0L
        byPid.map { case (pid, _, s) =>
          val o = ((pid, k), acc); acc += s; o
        }
      }.toMap
    val withSum = rdd.mapPartitionsWithIndex { (pid, it) =>
      var curKey: Any = null
      var started = false
      var acc = 0L
      it.map { r =>
        val k = r.get(keyIdx)
        if (!started || k != curKey) {
          curKey = k; started = true
          acc = offsets.getOrElse((pid, k), 0L)
        }
        acc += r.getLong(valIdx)
        Row.fromSeq(r.toSeq :+ acc)
      }
    }
    val schema = StructType(sorted.schema.fields :+
      StructField(outCol, LongType, nullable = false))
    spark.createDataFrame(withSum, schema)
  }
}
