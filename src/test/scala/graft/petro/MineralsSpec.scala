package graft.petro

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Parity fixtures from the reference test suite
  * (reference: tests/conftest.py + tests/test_minerals.py goldens). */
class MineralsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def frame(cols: Seq[String], rows: Seq[Seq[Double]]): DataFrame = {
    val schema = StructType(cols.map(c => StructField(c, DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r: _*)), 1), schema)
  }

  def row0(df: DataFrame): Map[String, Double] = {
    val r = df.collect()(0)
    df.columns.zipWithIndex.map { case (c, i) =>
      c -> (if (r.isNullAt(i)) Double.NaN else r.getDouble(i))
    }.toMap
  }

  // conftest.py:21 — ideal sanidine KAlSi3O8
  lazy val sanidine = frame(Seq("SiO2", "Al2O3", "K2O"), Seq(Seq(64.76, 18.31, 16.89)))
  // conftest.py:13 — ideal diopside CaMgSi2O6
  lazy val diopside = frame(Seq("SiO2", "MgO", "CaO"), Seq(Seq(55.49, 18.61, 25.90)))
  // conftest.py:60 — ideal andradite
  lazy val andradite = frame(
    Seq("SiO2", "Al2O3", "FeO", "CaO", "MgO", "MnO"),
    Seq(Seq(36.00, 0.00, 27.90, 33.00, 0.00, 0.00)))
  // conftest.py:46 — Mn-bearing garnet
  lazy val mnGarnet = frame(
    Seq("SiO2", "Al2O3", "FeO", "MnO", "MgO", "CaO"),
    Seq(Seq(36.50, 20.50, 25.00, 15.00, 1.50, 1.00)))
  // conftest.py:30 — fe clinopyroxene
  lazy val fePyroxene = frame(
    Seq("SiO2", "Al2O3", "FeO", "MgO", "CaO", "Na2O", "TiO2"),
    Seq(Seq(52.00, 4.50, 8.50, 15.00, 18.00, 1.50, 0.50)))
  // conftest.py:207 — ideal phlogopite
  lazy val phlogopite = frame(
    Seq("SiO2", "Al2O3", "FeO", "MgO", "K2O", "TiO2", "MnO", "Na2O", "BaO"),
    Seq(Seq(42.70, 11.70, 0.50, 29.10, 10.70, 0.20, 0.05, 0.10, 0.00)))

  test("sanidine Fsp apfu: Si~3, K~1 (test_minerals.py:150-156)") {
    val a = row0(Minerals.apfu(Minerals.Fsp, sanidine))
    assert(math.abs(a("Si{4+}") - 3.0) < 0.05)
    assert(math.abs(a("K{+}") - 1.0) < 0.05)
    assert(math.abs(a("Al{3+}") - 1.0) < 0.05)
  }

  test("sanidine Fsp end members: Or~100 (test_minerals.py:158-160)") {
    val e = row0(Minerals.endMembers(Minerals.Fsp, sanidine))
    assert(math.abs(e("Or") - 100.0) < 1.0)
  }

  test("diopside Cpx end members: Di~100 (test_minerals.py:212-217)") {
    val e = row0(Minerals.endMembers(Minerals.Cpx, diopside))
    assert(math.abs(e("Di") - 100.0) < 2.0)
    Seq("Jd", "Ae", "Kosmochlor", "CaTs", "En", "Fs", "Hd").foreach { n =>
      assert(math.abs(e(n)) < 1.0, s"$n = ${e(n)}")
    }
  }

  test("fe_pyroxene Cpx end members sum to ~100 (test_minerals.py:205-210)") {
    val e = row0(Minerals.endMembers(Minerals.Cpx, fePyroxene))
    assert(e.size == 9)
    assert(math.abs(e.values.sum - 100.0) < 1.0)
    e.values.foreach(v => assert(v >= -1e-9))
  }

  test("andradite GrtFe3: Adr > 90 (test_minerals.py:129-131)") {
    val e = row0(Minerals.endMembers(Minerals.GrtFe3, andradite))
    assert(e("Adr") > 90.0, s"Adr = ${e("Adr")}")
  }

  test("mn_garnet Grt invariants (test_minerals.py:51-88)") {
    val a = row0(Minerals.rawApfu(Minerals.Grt, mnGarnet))
    a.values.foreach(v => assert(v >= -1e-9))
    val sf = row0(Minerals.siteAllocations(Minerals.Grt, mnGarnet))
    val zSum = sf.collect { case (k, v) if k.startsWith("Z:") && !k.endsWith("_unallocated") => v }.sum
    assert(math.abs(zSum - 3.0) < 0.05, s"Z sum = $zSum")
    val e = row0(Minerals.endMembers(Minerals.Grt, mnGarnet))
    assert(math.abs(e.values.sum - 100.0) < 1e-6)
    assert(e("Sps") > 25.0) // Mn-rich garnet
  }

  test("phlogopite Bt: Phlogopite > 90 (test_minerals.py:372-374)") {
    val e = row0(Minerals.endMembers(Minerals.Bt, phlogopite))
    assert(e("Phlogopite") > 90.0, s"Phl = ${e("Phlogopite")}")
  }

  test("unit round trip wt% -> moles -> wt%") {
    val m = Convert.toMoles(mnGarnet)
    val back = row0(Convert.toOxides(m))
    val orig = row0(mnGarnet)
    orig.foreach { case (k, v) => assert(math.abs(back(k) - v) < 1e-9) }
  }

  test("apfu round trip with preserved analytical total (test_petro.py:121)") {
    import org.apache.spark.sql.functions._
    val total = mnGarnet.columns.map(col).reduce(_ + _)
    val withTotal = mnGarnet.withColumn("__total", total)
    val apfu = Convert.toApfu(withTotal, nOxygens = Some(12.0), carry = Seq("__total"))
    val back = Convert.fromApfu(apfu, nOxygens = Some(12.0),
      total = Some(col("__total")), carry = Seq("__total"))
    val orig = row0(mnGarnet)
    val rt = row0(back.drop("__total"))
    orig.foreach { case (k, v) => assert(math.abs(rt(k) - v) < 1e-6, s"$k: ${rt(k)} vs $v") }
  }

  test("normalize rows sum to 100") {
    val n = row0(Convert.normalize(mnGarnet))
    assert(math.abs(n.values.sum - 100.0) < 1e-9)
  }

  test("alumina saturation + Shand class") {
    import org.apache.spark.sql.functions._
    // granite-like: peraluminous (test_bulk.py:195-203)
    val granite = frame(Seq("SiO2", "Al2O3", "CaO", "Na2O", "K2O"),
      Seq(Seq(72.0, 14.5, 1.5, 3.5, 4.5)))
    val as = Convert.aluminaSaturation(granite)
    val cls = as.select(Convert.shandClass(col("A/NK"), col("A/CNK")).as("c"))
      .collect()(0).getString(0)
    assert(cls == "peraluminous")
  }
}
