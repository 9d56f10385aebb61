package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout clustering (z-ordering) — the write-time
  * optimization that makes SELECTIVE scans on MORE THAN ONE column cheap
  * at 100 TB. Range-partitioning or sorting by a single key gives parquet
  * min/max pruning on that key alone; interleaving the bits of two keys
  * into one Morton (z-curve) value and range-partitioning by it bounds
  * EVERY partition to a small rectangle in (x, y) space, so a filter on
  * EITHER column prunes most files (the Delta/Iceberg `OPTIMIZE ZORDER BY`
  * capability, built from plain Spark primitives).
  *
  * Scale shape, end to end: cutpoint estimation runs on a deterministic
  * hash sample (bounded rows — an explicit contract, NOT a global window
  * sort; a `ntile` over `Window.orderBy` would serialize the corpus
  * through one task), the 2·2^bits cutpoints are a driver k-row model
  * like the k-means centroids, cell assignment + interleave are narrow
  * codegen'd arithmetic, and the final placement is one
  * `repartitionByRange` on the z-value — the single write-time shuffle
  * this layout amortizes over every later pruned scan.
  */
object Layout {

  /** Morton/z-curve interleave of the low `bits` bits of two nonnegative
    * integer columns: bit i of `x` lands at position 2i, bit i of `y` at
    * 2i+1. Columns are taken modulo 2^bits (pre-quantized inputs — see
    * [[zorderCells]] for the skew-proof rank quantizer). Pure
    * shift/mask/add cascade: whole-stage codegen keeps it in one
    * compiled pass; the q24_zorder oracle mirrors it bit-for-bit in
    * SQL. */
  def zvalue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val m = 1L << bits
    val xm = pmod(x.cast("long"), lit(m))
    val ym = pmod(y.cast("long"), lit(m))
    (0 until bits).map { i =>
      shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Quantile-cutpoint quantizer + interleave: adds a `zvalue` column
    * placing each row on a 2^bits x 2^bits grid of roughly
    * equal-POPULATION cells (equal-width bucketing collapses under
    * skew; equal-population is what keeps z-ranges balanced — the
    * standard trick in Delta's OPTIMIZE).
    *
    * Cutpoints come from EXACT percentiles of a deterministic hash
    * sample: a row enters the sample iff `xxhash64(salt, x, y) %
    * sampleMod == 0`, so the layout is reproducible across runs and
    * partitionings with no RNG state. Size the contract so sample ≈
    * rows/sampleMod stays driver-safe (the exact-percentile aggregate
    * buffers only the sample; 2^20 doubles ≈ 8 MB). Cell boundaries
    * from a 1/sampleMod sample are within O(sqrt(sampleMod/rows)) of
    * the true quantiles — file bounding boxes stay compact, which is
    * all footer pruning needs. */
  def zorderCells(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 8, sampleMod: Int = 1): DataFrame = {
    require(!df.columns.contains("zvalue"),
      "column zvalue collides with zorderCells output")
    val cells = 1 << bits
    val fracs = (1 until cells).map(i => i.toDouble / cells)
    val sample = df.filter(
      pmod(xxhash64(lit("zo:"), col(xCol), col(yCol)), lit(sampleMod.toLong))
        === 0)
    val fracsSql = fracs.mkString("array(", ", ", ")")
    val cuts = sample.agg(
        expr(s"percentile($xCol, $fracsSql)").as("cx"),
        expr(s"percentile($yCol, $fracsSql)").as("cy"))
      .collect()(0) // 2 * (2^bits - 1) doubles — a k-row driver model
    require(!cuts.isNullAt(0) && !cuts.isNullAt(1),
      s"hash sample is empty at sampleMod=$sampleMod — lower it")
    def cellOf(c: Column, cut: Seq[Double]): Column =
      size(filter(lit(cut.toArray), b => b <= c.cast("double")))
    val cx = cuts.getSeq[Double](0)
    val cy = cuts.getSeq[Double](1)
    df.withColumn("zvalue",
      zvalue(cellOf(col(xCol), cx), cellOf(col(yCol), cy), bits))
  }

  /** Range-partition by z-value into `numFiles` output tasks and write —
    * the terminal layout step. Each output file then covers a compact
    * z-range = a bounded (x, y) rectangle, which is what parquet
    * min/max footer pruning needs. (`repartitionByRange` samples the
    * z distribution; rows WITHIN a file need no order for footer
    * pruning, only the file-level bounding boxes matter.) */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
      path: String, numFiles: Int, bits: Int = 8,
      sampleMod: Int = 1): Unit =
    zorderCells(df, xCol, yCol, bits, sampleMod)
      .repartitionByRange(numFiles, col("zvalue"))
      .drop("zvalue")
      .write.mode("overwrite").parquet(path)
}
