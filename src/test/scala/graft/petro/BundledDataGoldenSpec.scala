package graft.petro

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sources.Datasets

/** Goldens produced by RUNNING the reference library
  * (`PYTHONPATH=tools/refshim:/root/reference/src python3`) on its own
  * bundled datasets (sazava.csv whole-rock suite, grt_profile.csv
  * garnet traverse) and on positive-valence-split compositions — the
  * real-data complement to the ideal-composition fixtures in
  * ReferenceGoldenSpec/MineralsParitySpec. The sazava rows exercise the
  * full cleaning contract (NaN fill, negative clip, H2O_PLUS alias)
  * in front of the ratio/classification operators. */
class BundledDataGoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def frame(cols: Seq[String], rows: Seq[Seq[Double]]): DataFrame = {
    val schema = StructType(cols.map(c => StructField(c, DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r: _*)), 1), schema)
  }

  def rowAt(df: DataFrame, orderCol: String, i: Int): Map[String, Any] = {
    val cols = df.columns
    val r = df.orderBy(orderCol).collect()(i)
    cols.zipWithIndex.map { case (c, j) => c -> r.get(j) }.toMap
  }

  def approxRow(m: Map[String, Any], expect: Map[String, Double], tol: Double): Unit =
    expect.foreach { case (k, v) =>
      val got = m(k).asInstanceOf[Double]
      assert(math.abs(got - v) < tol, s"$k: $got vs reference $v")
    }

  lazy val sazava = Convert.clean(Datasets.sazava(spark))
    .withColumn("idx", col("_c0").cast("long"))

  test("sazava oxide ratios match reference rows (bulk.oxide_ratios on sazava.csv)") {
    val rat = Convert.oxideRatios(sazava, carry = Seq("idx"))
    approxRow(rowAt(rat, "idx", 0), Map(
      "FeOT" -> 6.67473, "Mg#" -> 0.511715, "Na2O+K2O" -> 5.02,
      "K2O/Na2O" -> 0.992063, "CaO/Na2O" -> 2.793651,
      "SiO2" -> 59.98, "TiO2" -> 0.63), 5e-7)
    approxRow(rowAt(rat, "idx", 6), Map(
      "FeOT" -> 8.587356, "Mg#" -> 0.729075, "Na2O+K2O" -> 2.74,
      "K2O/Na2O" -> 0.640719, "CaO/Na2O" -> 8.766467,
      "SiO2" -> 49.63, "TiO2" -> 0.76), 5e-7)
    approxRow(rowAt(rat, "idx", 13), Map(
      "FeOT" -> 2.832906, "Mg#" -> 0.277779, "Na2O+K2O" -> 4.37,
      "K2O/Na2O" -> 0.693798, "CaO/Na2O" -> 1.422481,
      "SiO2" -> 71.42, "TiO2" -> 0.3), 5e-7)
  }

  test("sazava alumina saturation + Shand classes match reference rows") {
    val asi = Convert.aluminaSaturation(sazava, carry = Seq("idx"))
      .withColumn("shand_class", Convert.shandClass(col("A/NK"), col("A/CNK")))
    val r0 = rowAt(asi, "idx", 0)
    approxRow(r0, Map("A/NK" -> 2.396488, "A/CNK" -> 0.835541), 5e-7)
    assert(r0("shand_class") == "metaluminous")
    val r6 = rowAt(asi, "idx", 6)
    approxRow(r6, Map("A/NK" -> 3.415701, "A/CNK" -> 0.437031), 5e-7)
    assert(r6("shand_class") == "metaluminous")
    val r13 = rowAt(asi, "idx", 13)
    approxRow(r13, Map("A/NK" -> 2.43292, "A/CNK" -> 1.169998), 5e-7)
    assert(r13("shand_class") == "peraluminous")
  }

  test("grt_profile garnet end members match reference traverse rows 0/49/98") {
    val prof = Convert.clean(Datasets.grtProfile(spark))
    val em = Minerals.endMembers(Minerals.Grt, prof, carry = Seq("position"))
    approxRow(rowAt(em, "position", 0), Map(
      "Prp" -> 16.1691, "Alm" -> 73.6893, "Sps" -> 4.5428,
      "Grs" -> 3.6959, "Adr" -> 1.9029, "Uvr" -> 0.0), 5e-5)
    approxRow(rowAt(em, "position", 49), Map(
      "Prp" -> 6.8589, "Alm" -> 51.7133, "Sps" -> 27.0304,
      "Grs" -> 12.6669, "Adr" -> 1.6386, "Uvr" -> 0.0918), 5e-5)
    approxRow(rowAt(em, "position", 98), Map(
      "Prp" -> 17.2463, "Alm" -> 73.34, "Sps" -> 3.9335,
      "Grs" -> 2.3463, "Adr" -> 2.9943, "Uvr" -> 0.1395), 5e-5)
  }

  test("grt_profile garnet APFU (droop Fe split) matches reference traverse rows") {
    val prof = Convert.clean(Datasets.grtProfile(spark))
    val ap = Minerals.apfu(Minerals.Grt, prof, carry = Seq("position"))
    approxRow(rowAt(ap, "position", 0), Map(
      "Al{3+}" -> 2.00194, "Ca{2+}" -> 0.16911, "Cr{3+}" -> 0.0,
      "Fe{2+}" -> 2.22584, "Fe{3+}" -> 0.01252, "Mg{2+}" -> 0.4884,
      "Mn{2+}" -> 0.11665, "Si{4+}" -> 2.98555, "Ti{4+}" -> 0.0), 5e-6)
    approxRow(rowAt(ap, "position", 49), Map(
      "Al{3+}" -> 1.9659, "Ca{2+}" -> 0.43666, "Cr{3+}" -> 0.00186,
      "Fe{2+}" -> 1.56842, "Fe{3+}" -> 0.02897, "Mg{2+}" -> 0.20803,
      "Mn{2+}" -> 0.7869, "Si{4+}" -> 2.9981, "Ti{4+}" -> 0.00518), 5e-6)
    approxRow(rowAt(ap, "position", 98), Map(
      "Al{3+}" -> 1.99117, "Ca{2+}" -> 0.16664, "Cr{3+}" -> 0.00283,
      "Fe{2+}" -> 2.2301, "Fe{3+}" -> 0.02441, "Mg{2+}" -> 0.52442,
      "Mn{2+}" -> 0.07884, "Si{4+}" -> 2.98159, "Ti{4+}" -> 0.0), 5e-6)
  }

  test("positive Mn split: droop and Schumacher estimates differ as in reference") {
    val mnRich = frame(Seq("SiO2", "Al2O3", "FeO", "MnO", "MgO", "CaO"),
      Seq(Seq(34.0, 19.0, 27.0, 18.0, 4.0, 2.0)))
    val apfu = Convert.toApfu(mnRich, nOxygens = Some(12.0))
    def split(m: String) = Valence.splitValence(
      apfu, apfu.columns.toSeq, "Mn", m, 12.0, 8.0)
    approxRow(rowAt(split("droop"), "Si{4+}", 0), Map(
      "Mn{2+}" -> 1.240165, "Mn{3+}" -> 0.932856,
      "Fe{2+}" -> 1.836763, "Mg{2+}" -> 0.485056), 5e-7)
    approxRow(rowAt(split("schumacher"), "Si{4+}", 0), Map(
      "Mn{2+}" -> 1.240165, "Mn{3+}" -> 0.970581), 5e-7)
  }

  test("Ti split clips the high estimate at the total (reference clip rule)") {
    val tiRich = frame(Seq("SiO2", "Al2O3", "FeO", "MgO", "CaO", "TiO2", "Na2O"),
      Seq(Seq(30.0, 10.0, 20.0, 16.0, 12.0, 18.0, 4.0)))
    val apfu = Convert.toApfu(tiRich, nOxygens = Some(6.0))
    Seq("droop", "schumacher").foreach { m =>
      val s = Valence.splitValence(apfu, apfu.columns.toSeq, "Ti", m, 6.0, 4.0)
      approxRow(rowAt(s, "Si{4+}", 0), Map(
        "Ti{4+}" -> 0.501308, "Ti{3+}" -> 0.501308), 5e-7)
    }
  }

  test("APFU round trip: diopside oxygen basis and sanidine cation basis (from_apfu)") {
    val dio = frame(Seq("SiO2", "MgO", "CaO"), Seq(Seq(55.49, 18.61, 25.90)))
    val apfu6 = Convert.toApfu(dio, nOxygens = Some(6.0))
    approxRow(rowAt(apfu6, "Si{4+}", 0), Map(
      "Si{4+}" -> 1.999964, "Mg{2+}" -> 0.999902, "Ca{2+}" -> 1.000171), 5e-7)
    // reference from_apfu without `total` returns UNNORMALIZED wt —
    // ideal-formula masses per formula unit, not a 100% analysis
    approxRow(rowAt(Convert.fromApfu(apfu6, nOxygens = Some(6.0)), "SiO2", 0), Map(
      "SiO2" -> 120.163833, "MgO" -> 40.300035, "CaO" -> 56.086561), 5e-6)
    val san = frame(Seq("SiO2", "Al2O3", "K2O"), Seq(Seq(64.76, 18.31, 16.89)))
    val apfu5c = Convert.toApfu(san, nCations = Some(5.0))
    approxRow(rowAt(apfu5c, "Si{4+}", 0), Map(
      "Si{4+}" -> 3.001313, "Al{3+}" -> 1.000102, "K{+}" -> 0.998585), 5e-7)
    approxRow(rowAt(Convert.fromApfu(apfu5c, nCations = Some(5.0)), "SiO2", 0), Map(
      "SiO2" -> 180.327889, "Al2O3" -> 50.985232, "K2O" -> 47.031162), 5e-6)
  }
}
