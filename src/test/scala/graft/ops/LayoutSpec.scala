package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Z-order layout: exact Morton arithmetic, deterministic quantizer,
  * and the property the op exists for — per-file bounding boxes under a
  * z-ordered write are FAR smaller than under the naive layout, so
  * parquet min/max pruning on either dimension skips most files. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("zvalue: hand-checked interleave and range bounds") {
    import spark.implicits._
    val rows = Seq((3L, 1L), (0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L))
      .toDF("x", "y")
    val z = rows.select(Layout.zvalue(col("x"), col("y"), 2).as("z2"),
        Layout.zvalue(col("x"), col("y"), 16).as("z16"))
      .collect()
    // bits=2: x=3 -> bits 0,2; y=1 -> bit 1 => 0b0111 = 7
    assert(z(0).getLong(0) == 7L)
    assert(z(1).getLong(0) == 0L)
    assert(z(2).getLong(0) == 1L) // x bit 0 -> position 0
    assert(z(3).getLong(0) == 2L) // y bit 0 -> position 1
    // full 16-bit interleave of all-ones is all 32 bits set
    assert(z(4).getLong(1) == (1L << 32) - 1)
    // modulo wrap: 65537 ≡ 1 (mod 2^16)
    val wrap = Seq((65537L, 0L)).toDF("x", "y")
      .select(Layout.zvalue(col("x"), col("y"), 16)).collect()(0).getLong(0)
    assert(wrap == 1L)
  }

  /** 4096 points on a 64x64 grid with skewed (quadratic) x spacing —
    * equal-width binning would pile most points into few cells. */
  private def grid = {
    import spark.implicits._
    (0 until 4096).map { i =>
      val gx = i % 64; val gy = i / 64
      (i.toLong, (gx.toLong * gx * gx) + 7, gy.toLong * 13 + 5)
    }.toDF("id", "x", "y")
  }

  test("zorderCells: deterministic, partitioning-invariant, balanced") {
    val a = Layout.zorderCells(grid, "x", "y", bits = 4)
      .select("id", "zvalue").collect().sortBy(_.getLong(0))
    val b = Layout.zorderCells(grid.repartition(13), "x", "y", bits = 4)
      .select("id", "zvalue").collect().sortBy(_.getLong(0))
    assert(a.map(_.getLong(1)).toSeq == b.map(_.getLong(1)).toSeq)
    // equal-population cells: with 4096 rows over a 16x16 grid no cell
    // holds more than ~4x its fair share despite the cubic x skew
    val byCell = Layout.zorderCells(grid, "x", "y", bits = 4)
      .groupBy("zvalue").count().agg(max("count")).collect()(0).getLong(0)
    assert(byCell <= 4096 / 256 * 4, s"worst cell $byCell")
  }

  test("writeZOrdered: per-file bounding boxes enable 2-D pruning") {
    val out = Files.createTempDirectory("zorder").toString
    Layout.writeZOrdered(grid, "x", "y", out, numFiles = 16, bits = 4)
    val boxes = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"), count(lit(1)).as("n"))
      .collect()
    assert(boxes.length == 16)
    assert(boxes.map(_.getAs[Long]("n")).sum == 4096L)
    // every (x, y) point survives the layout exactly once
    val total = spark.read.parquet(out).select("id").distinct().count()
    assert(total == 4096L)
    // pruning argument: a point filter on y alone overlaps few boxes.
    // y spans 5..824; probe y = 400 and count boxes whose [y0, y1]
    // contains it — under a random layout ALL 16 would.
    val hit = boxes.count(b =>
      b.getAs[Long]("y0") <= 400L && 400L <= b.getAs[Long]("y1"))
    assert(hit <= 8, s"$hit of 16 boxes overlap a point filter on y")
    val hitX = boxes.count(b =>
      b.getAs[Long]("x0") <= 30000L && 30000L <= b.getAs[Long]("x1"))
    assert(hitX <= 8, s"$hitX of 16 boxes overlap a point filter on x")
  }
}
