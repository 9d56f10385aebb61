package graft.petro

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Parity with reference tests/test_oxides_acc.py (OxidesAccessor):
  * oxide projection, canonical sort, means, and select — one test per
  * reference case. The pandas index has no Spark analogue, so
  * index-based selects run against an explicit label column (`lbl`),
  * which is how this engine represents row identity everywhere. */
class AccessorParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def frame(cols: Seq[(String, DataType)], rows: Seq[Seq[Any]]): DataFrame = {
    val schema = StructType(cols.map { case (c, t) => StructField(c, t) })
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r: _*)), 1), schema)
  }
  def dbl(cols: String*)(rows: Seq[Double]*): DataFrame =
    frame(cols.map(_ -> (DoubleType: DataType)), rows.map(_.map(_.asInstanceOf[Any])))

  lazy val fePyroxene = dbl("SiO2", "Al2O3", "FeO", "MgO", "CaO", "Na2O", "TiO2")(
    Seq(52.00, 4.50, 8.50, 15.00, 18.00, 1.50, 0.50))

  test("oxides() keeps oxide columns only (test_oxides_acc.py:12-19)") {
    val df = frame(
      Seq("SiO2" -> DoubleType, "FeO" -> DoubleType, "label" -> StringType),
      Seq(Seq(50.0, 10.0, "a")))
    assert(ChemSchema.of(df).oxideCols == Seq("SiO2", "FeO"))
    val pf = PetroFrame.clean(df, carry = Nil)
    assert(pf.oxides.df.columns.toSeq == Seq("SiO2", "FeO"))
  }

  test("oxides() with no oxide columns is empty (test_oxides_acc.py:25-28)") {
    val df = frame(
      Seq("label" -> StringType, "value" -> DoubleType), Seq(Seq("a", 1.0)))
    assert(ChemSchema.of(df).oxideCols.isEmpty)
    assert(PetroFrame.clean(df, carry = Nil).oxides.df.columns.isEmpty)
  }

  test("oxides() excludes element columns F/Cl (test_oxides_acc.py:30-34)") {
    val df = dbl("SiO2", "FeO", "F", "Cl")(Seq(50.0, 10.0, 0.3, 0.01))
    val cols = PetroFrame.clean(df, carry = Nil).oxides.df.columns.toSeq
    assert(!cols.contains("F") && !cols.contains("Cl"))
    assert(cols == Seq("SiO2", "FeO"))
  }

  test("moles -> oxides round trip restores wt% (test_oxides_acc.py:36-41)") {
    val dio = dbl("SiO2", "MgO", "CaO")(Seq(55.49, 18.61, 25.90))
    val back = PetroFrame.clean(dio, carry = Nil).moles.oxides
    assert(back.units == Units.WtPct)
    val r = back.df.collect()(0)
    assert(math.abs(r.getDouble(0) - 55.49) < 1e-9)
    assert(math.abs(r.getDouble(1) - 18.61) < 1e-9)
    assert(math.abs(r.getDouble(2) - 25.90) < 1e-9)
  }

  test("oxides() is idempotent (test_oxides_acc.py:43-51)") {
    val pf = PetroFrame.clean(fePyroxene, carry = Nil)
    val ox1 = pf.oxides
    val ox2 = ox1.oxides
    assert(ox1.df.columns.toSeq == ox2.df.columns.toSeq)
    assert(ox1.df.exceptAll(ox2.df).count() == 0)
    val viaMoles = pf.moles.oxides.oxides
    assert(viaMoles.df.exceptAll(ox1.df.select(viaMoles.df.columns.map(col): _*))
      .count() == 0)
  }

  test("sorted: majors in canonical order (test_oxides_acc.py:55-58)") {
    assert(PetroFrame.clean(fePyroxene, carry = Nil).oxidesSorted.df.columns.toSeq ==
      Seq("SiO2", "TiO2", "Al2O3", "FeO", "MgO", "CaO", "Na2O"))
  }

  test("sorted: volatiles at the end (test_oxides_acc.py:60-71)") {
    val df = dbl("CO2", "SiO2", "H2O", "FeO", "SO3")(
      Seq(1.0, 50.0, 2.0, 10.0, 0.5))
    assert(PetroFrame.clean(df, carry = Nil).oxidesSorted.df.columns.toSeq ==
      Seq("SiO2", "FeO", "H2O", "CO2", "SO3"))
  }

  test("sorted: other oxides alphabetical after majors (test_oxides_acc.py:73-76)") {
    val df = dbl("SiO2", "Al2O3", "FeO", "Cr2O3", "CaO", "MgO", "MnO")(
      Seq(36.0, 0.0, 27.9, 0.0, 33.0, 0.0, 0.0))
    assert(PetroFrame.clean(df, carry = Nil).oxidesSorted.df.columns.toSeq ==
      Seq("SiO2", "Al2O3", "FeO", "MnO", "MgO", "CaO", "Cr2O3"))
  }

  test("sorted: non-oxide columns excluded (test_oxides_acc.py:78-88)") {
    val df = frame(
      Seq("label" -> StringType, "FeO" -> DoubleType, "SiO2" -> DoubleType,
        "spot" -> LongType),
      Seq(Seq("a", 10.0, 50.0, 1L)))
    assert(PetroFrame.clean(df, carry = Nil).oxidesSorted.df.columns.toSeq ==
      Seq("SiO2", "FeO"))
  }

  test("sorted is idempotent (test_oxides_acc.py:96-99)") {
    val s1 = PetroFrame.clean(fePyroxene, carry = Nil).oxidesSorted
    val s2 = s1.oxidesSorted
    assert(s1.df.columns.toSeq == s2.df.columns.toSeq)
  }

  test("mean: single row unchanged (test_oxides_acc.py:107-110)") {
    val m = PetroFrame.clean(fePyroxene, carry = Nil).mean()
    assert(m.count() == 1)
    assert(math.abs(m.collect()(0).getAs[Double]("SiO2") - 52.0) < 1e-12)
  }

  test("mean: multi row averages per column (test_oxides_acc.py:112-121)") {
    val df = dbl("SiO2", "Al2O3", "FeO")(
      Seq(60.0, 15.0, 5.0), Seq(70.0, 13.0, 3.0))
    val r = PetroFrame.clean(df, carry = Nil).mean().collect()(0)
    assert(math.abs(r.getAs[Double]("SiO2") - 65.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("Al2O3") - 14.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("FeO") - 4.0) < 1e-12)
  }

  test("mean: output columns match the oxide projection (test_oxides_acc.py:123-125)") {
    val pf = PetroFrame.clean(fePyroxene, carry = Nil)
    assert(pf.mean().columns.toSeq == pf.oxides.df.columns.toSeq)
  }

  test("mean(groupby): one row per group with group means (test_oxides_acc.py:130-142)") {
    val df = frame(
      Seq("SiO2" -> DoubleType, "Al2O3" -> DoubleType, "FeO" -> DoubleType,
        "sample" -> StringType),
      Seq(Seq(60.0, 15.0, 5.0, "A"), Seq(70.0, 13.0, 3.0, "A"),
        Seq(80.0, 11.0, 1.0, "B")))
    val m = PetroFrame.clean(df, carry = Seq("sample")).mean(groupBy = Some("sample"))
      .orderBy("sample").collect()
    assert(m.length == 2)
    assert(m(0).getAs[String]("sample") == "A" &&
      math.abs(m(0).getAs[Double]("SiO2") - 65.0) < 1e-12)
    assert(m(1).getAs[String]("sample") == "B" &&
      math.abs(m(1).getAs[Double]("SiO2") - 80.0) < 1e-12)
  }

  test("mean(groupby): missing group column raises (test_oxides_acc.py:166-169)") {
    val pf = PetroFrame.clean(fePyroxene, carry = Nil)
    intercept[Exception] { pf.mean(groupBy = Some("missing")).collect() }
  }

  test("select(str): contains-match on a label column (test_oxides_acc.py:177-186)") {
    val df = frame(
      Seq("lbl" -> StringType, "SiO2" -> DoubleType, "FeO" -> DoubleType),
      Seq(Seq("sample_1", 60.0, 8.0), Seq("sample_2", 70.0, 9.0)))
    val pf = PetroFrame.clean(df, carry = Seq("lbl"))
    val got = pf.select("sample_1", on = "lbl")
    assert(got.df.count() == 1)
    assert(got.df.collect()(0).getAs[String]("lbl") == "sample_1")
  }

  test("select(str): matches rows whose value contains the pattern (test_oxides_acc.py:188-196)") {
    val df = frame(
      Seq("oxide" -> StringType, "value" -> DoubleType),
      Seq(Seq("SiO2", 60.0), Seq("FeO", 8.0), Seq("Fe2O3", 2.0), Seq("MgO", 10.0)))
    val got = PetroFrame.clean(df, carry = Seq("oxide")).select("Fe", on = "oxide")
      .df.select("oxide").collect().map(_.getString(0)).toSeq
    assert(got == Seq("FeO", "Fe2O3"))
  }

  test("select(str) is case sensitive (test_oxides_acc.py:198-204)") {
    val df = frame(
      Seq("lbl" -> StringType, "SiO2" -> DoubleType),
      Seq(Seq("FeO_point", 60.0), Seq("SiO2_point", 70.0)))
    assert(PetroFrame.clean(df, carry = Seq("lbl")).select("fe", on = "lbl")
      .df.count() == 0)
  }

  test("select(str): no match returns empty with schema intact (test_oxides_acc.py:206-213)") {
    val df = frame(
      Seq("lbl" -> StringType, "SiO2" -> DoubleType, "FeO" -> DoubleType),
      Seq(Seq("a", 60.0, 8.0), Seq("b", 70.0, 9.0)))
    val got = PetroFrame.clean(df, carry = Seq("lbl")).select("Zzzz", on = "lbl")
    assert(got.df.count() == 0)
    assert(got.df.columns.toSeq == Seq("lbl", "SiO2", "FeO"))
  }

  test("select(list): exact membership, preserves order (test_oxides_acc.py:225-244)") {
    val df = frame(
      Seq("oxide" -> StringType, "value" -> DoubleType),
      Seq(Seq("SiO2", 60.0), Seq("FeO", 8.0), Seq("Fe2O3", 2.0), Seq("MgO", 10.0)))
    val got = PetroFrame.clean(df, carry = Seq("oxide"))
      .selectIn(Seq("FeO", "MgO"), on = "oxide")
      .df.select("oxide").collect().map(_.getString(0)).toSeq
    assert(got == Seq("FeO", "MgO"))
  }

  test("select(empty list) returns empty (test_oxides_acc.py:255-261)") {
    val df = frame(
      Seq("lbl" -> StringType, "SiO2" -> DoubleType),
      Seq(Seq("a", 60.0), Seq("b", 70.0)))
    assert(PetroFrame.clean(df, carry = Seq("lbl")).selectIn(Nil, on = "lbl")
      .df.count() == 0)
  }
}
