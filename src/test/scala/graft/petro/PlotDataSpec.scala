package graft.petro

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Parity with reference tests/test_plotting.py expression + reduction
  * behaviors (rendering excluded — engine scope is plottable data). */
class PlotDataSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def frame(cols: Seq[String], rows: Seq[Seq[Double]]): DataFrame = {
    val schema = StructType(cols.map(c => StructField(c, DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r: _*)), 1), schema)
  }

  lazy val garnet = frame(Seq("Prp", "Alm", "Sps", "Grs"),
    Seq(Seq(20.0, 60.0, 15.0, 5.0), Seq(10.0, 70.0, 10.0, 10.0)))

  test("expression: exact column, sum, missing-name->0 (test_plotting.py:100-133)") {
    import org.apache.spark.sql.functions._
    val direct = garnet.select(PlotData.evalExpr(garnet, "Alm").as("v"))
      .collect().map(_.getDouble(0)).toSeq
    assert(direct == Seq(60.0, 70.0))
    val sum2 = garnet.select(PlotData.evalExpr(garnet, "Sps+Grs").as("v"))
      .collect().map(_.getDouble(0)).toSeq
    assert(sum2 == Seq(20.0, 20.0))
    // missing name inside multi-term defaults to 0
    val withMissing = garnet.select(PlotData.evalExpr(garnet, "Sps+Uvr").as("v"))
      .collect().map(_.getDouble(0)).toSeq
    assert(withMissing == Seq(15.0, 10.0))
    // single missing column raises
    intercept[IllegalArgumentException] { PlotData.evalExpr(garnet, "Uvr") }
  }

  test("expression: backtick-quoted exotic names (test_plotting.py backticks)") {
    val ions = frame(Seq("Al{3+}", "Si{4+}"), Seq(Seq(2.0, 3.0)))
    val v = ions.select(PlotData.evalExpr(ions, "`Al{3+}` + `Si{4+}`").as("v"))
      .collect()(0).getDouble(0)
    assert(v == 5.0)
    // missing backticked name -> 0 within multi-term
    val v2 = ions.select(PlotData.evalExpr(ions, "`Al{3+}` + `Fe{3+}`").as("v"))
      .collect()(0).getDouble(0)
    assert(v2 == 2.0)
  }

  test("expression: eval-reserved function names are never zero-filled (test_plotting.py funcs)") {
    val v = garnet.select(PlotData.evalExpr(garnet, "sqrt(Alm)").as("v"))
      .collect().map(_.getDouble(0)).toSeq
    assert(v.zip(Seq(60.0, 70.0)).forall { case (got, x) =>
      math.abs(got - math.sqrt(x)) < 1e-12
    })
    // mixed: function + missing name + literal arithmetic
    val mixed = garnet.select(PlotData.evalExpr(garnet, "sqrt(Alm) + Uvr * 2").as("v"))
      .collect().map(_.getDouble(0)).toSeq
    assert(mixed.zip(Seq(60.0, 70.0)).forall { case (got, x) =>
      math.abs(got - math.sqrt(x)) < 1e-12
    })
  }

  test("expression: single missing backticked name raises (test_plotting.py:126-133)") {
    val ions = frame(Seq("Al{3+}", "Si{4+}"), Seq(Seq(2.0, 3.0)))
    intercept[IllegalArgumentException] { PlotData.evalExpr(ions, "`Fe{3+}`") }
    // and a present backticked single name resolves directly
    val v = ions.select(PlotData.evalExpr(ions, "`Si{4+}`").as("v"))
      .collect()(0).getDouble(0)
    assert(v == 3.0)
  }

  test("ternary projection: vertices land on triangle corners") {
    val tern = frame(Seq("t", "l", "r"),
      Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0), Seq(0.0, 0.0, 1.0),
        Seq(1.0, 1.0, 1.0)))
    val got = PlotData.ternary(tern, "t", "l", "r").collect()
    val xs = got.map(_.getDouble(3)); val ys = got.map(_.getDouble(4))
    assert(ys(0) == 1.0 && xs(0) == 0.0) // top vertex
    assert(math.abs(xs(1) + 1.0 / math.sqrt(3.0)) < 1e-12 && ys(1) == 0.0)
    assert(math.abs(xs(2) - 1.0 / math.sqrt(3.0)) < 1e-12 && ys(2) == 0.0)
    assert(math.abs(xs(3)) < 1e-12 && math.abs(ys(3) - 1.0 / 3) < 1e-12) // centroid
  }

  test("auto-split separates high-mean from low-mean columns (test_plotting.py:502-575)") {
    // profile_groups fixture shape: p1 majors (CaO/FeO/MgO/MnO), p2 traces
    val p1 = frame(Seq("CaO", "FeO", "MgO", "MnO"),
      (1 to 10).map(i => Seq(8.0 + i * 0.1, 7.0, 5.0, 6.0)))
    val p2 = frame(Seq("ZnO", "Na2O"),
      (1 to 10).map(i => Seq(0.05, 0.02 + i * 0.001)))
    val secondary = PlotData.autoSplit(Seq(p1, p2))
    assert(secondary == Set("ZnO", "Na2O"))
  }

  test("auto-split matches reference on a single-outlier fixture (reference-run golden)") {
    // running the reference _auto_split on this exact fixture returns
    // {FeO}: the high outlier goes secondary because the first-seen
    // column (CaO) keeps the primary axis
    val p1 = frame(Seq("CaO", "FeO", "MgO", "MnO"),
      Seq(Seq(5.0, 20.0, 4.0, 1.0), Seq(5.5, 21.0, 4.2, 1.1), Seq(6.0, 22.0, 4.4, 0.9)))
    val p2 = frame(Seq("ZnO", "Na2O"),
      Seq(Seq(0.2, 0.5), Seq(0.3, 0.6), Seq(0.25, 0.55)))
    val secondary = PlotData.autoSplit(Seq(p1, p2),
      candidates = Some(Seq("CaO", "FeO", "MgO", "MnO", "ZnO", "Na2O")))
    assert(secondary == Set("FeO"), s"got $secondary")
  }

  test("expression language resolves backtick-quoted ion names (test_plotting.py:68-77)") {
    val df = frame(Seq("Al{3+}", "Si{4+}"), Seq(Seq(2.0, 3.0)))
    val got = df.select(PlotData.evalExpr(df, "`Al{3+}` + `Si{4+}`").as("v"))
      .collect()(0).getDouble(0)
    assert(got == 5.0)
    // bare ion name also resolves as a direct column reference
    val one = df.select(PlotData.evalExpr(df, "Al{3+}").as("v")).collect()(0).getDouble(0)
    assert(one == 2.0)
  }

  test("variance helper matches population variance") {
    assert(PlotData.variance(Seq(1.0, 3.0)) == 1.0)
    assert(PlotData.variance(Seq(2.0)) == 0.0)
  }

  test("sorted oxide projection uses canonical petrological order") {
    // like the reference's df.oxides.sorted(), non-oxide formula columns
    // (F) are excluded by the oxide projection itself
    val df = frame(Seq("ZnO", "CaO", "SiO2", "F", "Al2O3"),
      Seq(Seq(1.0, 2.0, 3.0, 4.0, 5.0)))
    assert(PlotData.sortedOxides(df).columns.toSeq ==
      Seq("SiO2", "Al2O3", "CaO", "ZnO"))
  }
}
