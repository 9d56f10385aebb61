package graft.petro

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** CIPW parity tests (reference: tests/test_bulk.py:132-430 +
  * tests/conftest.py:610-667 bulk fixtures). */
class CipwSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val bulkCols = Seq("SiO2", "TiO2", "Al2O3", "Fe2O3", "FeO", "MnO", "MgO",
    "CaO", "Na2O", "K2O", "P2O5")

  def frame(rows: Seq[Seq[Double]]): DataFrame = {
    val schema = StructType(bulkCols.map(c => StructField(c, DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r: _*)), 1), schema)
  }

  lazy val granite = frame(Seq(Seq(72.0, 0.3, 14.0, 1.2, 1.8, 0.05, 0.7, 1.8, 3.2, 4.5, 0.12)))
  lazy val basalt = frame(Seq(Seq(49.5, 2.0, 14.5, 3.5, 9.0, 0.18, 7.5, 10.5, 2.5, 0.4, 0.25)))
  lazy val diorite = frame(Seq(Seq(59.03, 0.7, 16.5, 2.5, 5.0, 0.12, 4.0, 6.5, 3.5, 2.0, 0.15)))

  def row0(df: DataFrame): Map[String, Double] = {
    val r = df.collect()(0)
    df.columns.zipWithIndex.map { case (c, i) =>
      c -> (if (r.isNullAt(i)) Double.NaN else r.getDouble(i))
    }.toMap
  }

  test("granite cipw has quartz and feldspars (test_bulk.py:296-306)") {
    val n = row0(Cipw.cipwNorm(granite))
    assert(n("Q") > 0)
    assert(n.contains("Or") && n.contains("Ab") && n.contains("An"))
    assert(n("Or") > 20 && n("Ab") > 20) // granite: feldspar-rich
  }

  test("basalt cipw has diopside and ol-or-hy (test_bulk.py:307-317)") {
    val n = row0(Cipw.cipwNorm(basalt))
    assert(n("Di") > 0)
    assert(n.getOrElse("Hy", 0.0) > 0 || n.getOrElse("Ol", 0.0) > 0)
  }

  test("cipw normsum totals ~100 (test_bulk.py:318-327,352-355)") {
    for (b <- Seq(granite, basalt, diorite)) {
      val n = row0(Cipw.cipwNorm(b, normsum = true))
      assert(math.abs(n("Total") - 100.0) < 0.1, s"Total=${n("Total")}")
    }
  }

  test("cipw minerals non-negative, no NaN (test_bulk.py:328-331,357-360)") {
    val n = row0(Cipw.cipwNorm(granite))
    n.foreach { case (k, v) =>
      assert(!v.isNaN, s"NaN in $k"); assert(v >= 0, s"$k = $v")
    }
  }

  test("cipw default drops sub-mineral splits (test_bulk.py:346-350)") {
    val n = Cipw.cipwNorm(granite)
    Seq("En", "Fs", "Fo", "Fa", "MgDi", "FeDi").foreach(c =>
      assert(!n.columns.contains(c)))
    val full = Cipw.cipwNorm(granite, completeResults = true)
    assert(Seq("En", "Fs", "Fo", "Fa").exists(full.columns.contains))
  }

  test("cipwhb recasts mafics into biotite/hornblende (test_bulk.py:373-430)") {
    val n = row0(Cipw.cipwNormHb(granite, normsum = true))
    assert(n("Q") > 0)
    assert(math.abs(n("Total") - 100.0) < 0.1)
    val nb = row0(Cipw.cipwNormHb(basalt, normsum = true))
    assert(math.abs(nb("Total") - 100.0) < 0.1)
    assert(nb.getOrElse("Hbl", 0.0) > 0 || nb.getOrElse("Bi", 0.0) > 0)
  }

  test("simple cipw: granite has Q, feldspars; sums ~100 (test_bulk.py:132-167)") {
    val n = row0(Cipw.cipwNormSimple(granite))
    assert(n("Q") > 0)
    assert(n("Or") > 0 && n("Ab") > 0 && n("An") > 0)
    val total = n.values.sum
    assert(math.abs(total - 100.0) < 5.0, s"sum=$total")
    val nb = row0(Cipw.cipwNormSimple(basalt))
    assert(nb("Di") > 0)
    assert(math.abs(nb.values.sum - 100.0) < 5.0)
  }
}
