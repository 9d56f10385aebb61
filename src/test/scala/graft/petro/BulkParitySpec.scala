package graft.petro

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Parity with reference tests/test_bulk.py (BulkAccessor + CIPW +
  * alumina saturation + oxide ratios) on the conftest granite/basalt/
  * diorite bulk-rock fixtures — one test per reference assertion
  * group. Naming note: the engine's classification column is `shand`
  * where the reference uses `shand_class`; values are identical. */
class BulkParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def dbl(cols: String*)(rows: Seq[Double]*): DataFrame = {
    val schema = StructType(cols.map(c => StructField(c, DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => Row(r.map(_.asInstanceOf[Any]): _*)), 1), schema)
  }
  def row0(df: DataFrame): Map[String, Double] = {
    val r = df.collect()(0)
    df.columns.zipWithIndex.collect {
      case (c, i) if df.schema(i).dataType == DoubleType && !r.isNullAt(i) =>
        c -> r.getDouble(i)
    }.toMap
  }

  // conftest.py bulk-rock fixtures
  lazy val granite = dbl("SiO2", "TiO2", "Al2O3", "Fe2O3", "FeO", "MnO",
    "MgO", "CaO", "Na2O", "K2O", "P2O5")(
    Seq(72.0, 0.3, 14.0, 1.2, 1.8, 0.05, 0.7, 1.8, 3.2, 4.5, 0.12))
  lazy val basalt = dbl("SiO2", "TiO2", "Al2O3", "Fe2O3", "FeO", "MnO",
    "MgO", "CaO", "Na2O", "K2O", "P2O5")(
    Seq(49.5, 2.0, 14.5, 3.5, 9.0, 0.18, 7.0, 11.0, 2.5, 0.5, 0.3))
  lazy val diorite = dbl("SiO2", "TiO2", "Al2O3", "Fe2O3", "FeO", "MnO",
    "MgO", "CaO", "Na2O", "K2O", "P2O5")(
    Seq(59.03, 0.7, 16.5, 2.5, 5.0, 0.12, 4.0, 6.5, 3.5, 2.0, 0.15))

  test("bulk(): cleaning resolves aliases (test_bulk.py:33-36)") {
    val df = dbl("SiO2", "FeO*", "MgO")(Seq(70.0, 3.0, 1.0))
    val cleaned = PetroFrame.clean(df, carry = Nil).df
    assert(cleaned.columns.contains("FeO") && !cleaned.columns.contains("FeO*"))
  }

  test("bulk(): element columns pass through (test_bulk.py:42-49)") {
    val df = dbl("SiO2", "Al2O3", "F", "S", "Cl")(
      Seq(70.0, 14.0, 0.3, 0.05, 0.01))
    val b = PetroFrame.clean(df, carry = Nil).bulk.df
    assert(Seq("F", "S", "Cl").forall(b.columns.contains))
  }

  test("bulk(): NaN filled and negatives clipped on element columns (test_bulk.py:51-62)") {
    val df = dbl("SiO2", "Al2O3", "F", "S")(
      Seq(70.0, 14.0, Double.NaN, -0.5))
    val m = row0(PetroFrame.clean(df, carry = Nil).df)
    assert(m("F") == 0.0 && m("S") == 0.0)
  }

  test("bulk.mean() includes element columns (test_bulk.py:64-74)") {
    val df = dbl("SiO2", "Al2O3", "F")(
      Seq(70.0, 14.0, 0.3), Seq(72.0, 15.0, 0.5))
    val m = PetroFrame.clean(df, carry = Nil).bulk.mean()
    assert(m.columns.contains("F"))
    assert(math.abs(m.collect()(0).getAs[Double]("F") - 0.4) < 1e-12)
  }

  test("normalized sums to 100 and keeps elements (test_bulk.py:76-89)") {
    val df = dbl("SiO2", "Al2O3", "F")(Seq(70.0, 14.0, 0.3))
    val n = row0(PetroFrame.clean(df, carry = Nil).normalized.df)
    assert(math.abs(n.values.sum - 100.0) < 1e-9)
    assert(n("F") > 0)
    val g = row0(PetroFrame.clean(granite, carry = Nil).normalized.df)
    assert(math.abs(g.values.sum - 100.0) < 1e-9)
  }

  test("reframe keeps existing, zero-fills missing, honors order (test_bulk.py:98-129)") {
    val pf = PetroFrame.clean(granite, carry = Nil)
    val kept = pf.reframe(Seq("SiO2", "Al2O3")).df
    assert(kept.columns.toSeq == Seq("SiO2", "Al2O3"))
    assert(row0(kept)("SiO2") == 72.0)
    val zeroed = pf.reframe(Seq("SiO2", "F", "Cl")).df
    assert(row0(zeroed)("F") == 0.0 && row0(zeroed)("Cl") == 0.0)
    val reordered = pf.reframe(Seq("Al2O3", "SiO2")).df
    assert(reordered.columns.toSeq == Seq("Al2O3", "SiO2"))
    val allMissing = PetroFrame.clean(dbl("SiO2", "FeO")(Seq(70.0, 5.0)), carry = Nil)
      .reframe(Seq("F", "Cl", "S")).df
    assert(allMissing.columns.toSeq == Seq("F", "Cl", "S"))
    assert(row0(allMissing).values.forall(_ == 0.0))
  }

  test("cipw_simple: granite has quartz and feldspars (test_bulk.py:133-142)") {
    val r = row0(PetroFrame.clean(granite, carry = Nil).cipwSimple)
    assert(r("Q") > 0)
    assert(r.contains("Or") && r.contains("Ab") && r.contains("An"))
  }

  test("cipw_simple: basalt has diopside and Hy-or-Ol (test_bulk.py:144-153)") {
    val r = row0(PetroFrame.clean(basalt, carry = Nil).cipwSimple)
    assert(r("Di") > 0)
    assert(r.getOrElse("Hy", 0.0) > 0 || r.getOrElse("Ol", 0.0) > 0)
  }

  test("cipw_simple: totals ~100 for granite, basalt, diorite (test_bulk.py:155-163,173-176)") {
    for (b <- Seq(granite, basalt, diorite)) {
      val r = row0(PetroFrame.clean(b, carry = Nil).cipwSimple)
      assert(math.abs(r.values.sum - 100.0) < 2.0, s"total ${r.values.sum}")
    }
  }

  test("cipw_simple: minerals non-negative, iron oxides present, no NaN (test_bulk.py:165-186)") {
    val df = PetroFrame.clean(granite, carry = Nil).cipwSimple
    val r = row0(df)
    assert(r.values.forall(_ >= 0.0))
    assert(r.contains("Il") || r.contains("Mt"))
    val row = df.collect()(0)
    df.columns.indices.foreach { i =>
      assert(!row.isNullAt(i) && !row.getDouble(i).isNaN, s"NaN in ${df.columns(i)}")
    }
  }

  test("cipw (GCDkit): granite Q>0 + feldspars; Totals ~100 across fixtures (test_bulk.py:296-340)") {
    val g = row0(PetroFrame.clean(granite, carry = Nil).cipw())
    assert(g("Q") > 0 && g.contains("Or") && g.contains("Ab") && g.contains("An"))
    assert(g.values.forall(_ >= -1e-9))
    for (b <- Seq(granite, basalt, diorite)) {
      val r = row0(PetroFrame.clean(b, carry = Nil).cipw(normsum = true))
      assert(math.abs(r("Total") - 100.0) < 2.0, s"Total ${r("Total")}")
    }
  }

  test("cipw complete_results keeps subcolumns; default drops them (test_bulk.py:341-350)") {
    val complete = Cipw.cipwNorm(granite, completeResults = true).columns.toSet
    assert(Seq("En", "Fs", "Fo", "Fa").exists(complete.contains))
    val dropped = row0(PetroFrame.clean(granite, carry = Nil).cipw()).keySet
    Seq("En", "Fs", "Fo", "Fa", "MgDi", "FeDi").foreach(c =>
      assert(!dropped.contains(c), s"$c should be dropped by default"))
  }

  test("cipw normsum normalizes to a Total column (test_bulk.py:352-356)") {
    val r = row0(PetroFrame.clean(granite, carry = Nil).cipw(normsum = true))
    assert(r.contains("Total"))
    assert(math.abs(r("Total") - 100.0) < 1e-6)
  }

  test("cipwhb: granite gets biotite, basalt gets hornblende (test_bulk.py:385-391)") {
    val g = row0(PetroFrame.clean(granite, carry = Nil).cipwHb())
    assert(g.getOrElse("Bi", 0.0) > 0, "granite biotite recast missing")
    val b = row0(PetroFrame.clean(basalt, carry = Nil).cipwHb())
    assert(b.getOrElse("Hbl", 0.0) > 0, "basalt hornblende recast missing")
  }

  test("alumina saturation: output columns + A/NK positive (test_bulk.py:190-194,217-220)") {
    val r = PetroFrame.clean(granite, carry = Nil).aluminaSaturation()
    assert(r.columns.contains("A/NK") && r.columns.contains("A/CNK"))
    assert(row0(PetroFrame.clean(basalt, carry = Nil).aluminaSaturation())("A/NK") > 0)
  }

  test("granite is peraluminous, basalt metaluminous (test_bulk.py:195-211)") {
    val g = PetroFrame.clean(granite, carry = Nil).aluminaSaturation(classify = true)
    assert(row0(g)("A/CNK") > 1.0)
    assert(g.collect()(0).getAs[String]("shand") == "peraluminous")
    val b = PetroFrame.clean(basalt, carry = Nil).aluminaSaturation(classify = true)
    val bm = row0(b)
    assert(bm("A/CNK") < 1.0 && bm("A/NK") >= 1.0)
    assert(b.collect()(0).getAs[String]("shand") == "metaluminous")
  }

  test("no classification column by default (test_bulk.py:213-215)") {
    assert(!PetroFrame.clean(granite, carry = Nil).aluminaSaturation()
      .columns.contains("shand"))
  }

  test("oxide ratios: columns + FeOT/alkali/K-Na values (test_bulk.py:228-255)") {
    val r = row0(PetroFrame.clean(granite, carry = Nil).oxideRatios)
    assert(math.abs(r("FeOT") - (1.8 + 0.8998 * 1.2)) < 0.01)
    assert(r("Mg#") > 0.0 && r("Mg#") < 1.0)
    assert(math.abs(r("Na2O+K2O") - 7.7) < 0.01)
    assert(math.abs(r("K2O/Na2O") - 4.5 / 3.2) < 0.01)
    assert(math.abs(r("SiO2") - 72.0) < 1e-9)
  }

  test("oxide ratios omitted when inputs missing (test_bulk.py:257-264)") {
    val df = dbl("SiO2", "MgO")(Seq(70.0, 2.0))
    val cols = Convert.oxideRatios(df).columns.toSet
    assert(!cols.contains("Mg#") && !cols.contains("FeOT"))
  }
}
