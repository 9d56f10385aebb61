package graft.petro

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Multi-row parity fixtures for every end-member model, transcribed
  * from the reference suite (tests/conftest.py:84-602 fixtures +
  * tests/test_minerals.py goldens; bulk fixtures conftest.py:610-667 +
  * tests/test_bulk.py). Tolerances match the pytest.approx values. */
class MineralsParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def frame(cols: Seq[String], rows: Seq[Seq[Double]]): DataFrame = {
    val schema = StructType(cols.map(c => StructField(c, DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r: _*)), 1), schema)
  }

  /** All rows as column->value maps, in input order. */
  def rows(df: DataFrame): Seq[Map[String, Double]] = {
    val cols = df.columns
    df.collect().toSeq.map { r =>
      cols.zipWithIndex.map { case (c, i) =>
        c -> (if (r.isNullAt(i)) Double.NaN else r.getDouble(i))
      }.toMap
    }
  }

  def sumsTo100(df: DataFrame, tol: Double): Unit =
    rows(df).zipWithIndex.foreach { case (m, i) =>
      assert(math.abs(m.values.sum - 100.0) < tol,
        s"row $i sums to ${m.values.sum}")
    }

  def noNegatives(df: DataFrame): Unit =
    rows(df).foreach(_.foreach { case (c, v) =>
      assert(v.isNaN || v >= -1e-9, s"$c has negative $v")
    })

  def siteSum(df: DataFrame, site: String): Seq[Double] = {
    val cols = df.columns.filter(c =>
      c.startsWith(s"$site:") && !c.endsWith("_unallocated"))
    rows(df).map(m => cols.map(m).sum)
  }

  // ---- fixtures (conftest.py) ----------------------------------------------

  lazy val garnetMulti = frame(
    Seq("SiO2", "Al2O3", "FeO", "MnO", "MgO", "CaO"),
    Seq(Seq(36.50, 20.50, 25.00, 15.00, 1.50, 1.00),
      Seq(38.20, 22.10, 18.50, 2.00, 15.00, 4.00),
      Seq(35.80, 21.00, 28.00, 8.00, 3.00, 4.50)))

  lazy val feGarnetMulti = frame(
    Seq("SiO2", "Al2O3", "FeO", "Cr2O3", "CaO", "MgO", "MnO"),
    Seq(Seq(36.00, 0.00, 27.90, 0.00, 33.00, 0.00, 0.00),
      Seq(38.00, 20.00, 20.00, 0.00, 3.00, 12.00, 2.00),
      Seq(37.00, 5.00, 8.00, 10.00, 28.00, 7.00, 0.50)))

  lazy val cpxMulti = frame(
    Seq("SiO2", "Al2O3", "FeO", "MgO", "CaO", "Na2O", "TiO2"),
    Seq(Seq(52.00, 4.50, 8.50, 15.00, 18.00, 1.50, 0.50),
      Seq(48.50, 8.00, 12.00, 10.00, 20.00, 0.50, 1.00),
      Seq(54.00, 2.00, 5.00, 18.00, 15.00, 3.00, 0.20)))

  lazy val crClinopyroxene = frame(
    Seq("SiO2", "Al2O3", "Cr2O3", "FeO", "MgO", "CaO", "Na2O", "TiO2"),
    Seq(Seq(50.00, 3.00, 2.50, 6.00, 14.00, 16.00, 2.00, 0.30)))

  lazy val feldsparMulti = frame(
    Seq("SiO2", "Al2O3", "CaO", "Na2O", "K2O"),
    Seq(Seq(64.76, 18.31, 0.00, 1.50, 16.89),
      Seq(52.00, 30.00, 13.00, 3.50, 0.50),
      Seq(68.00, 19.50, 0.50, 11.00, 0.80)))

  lazy val opxMulti = frame(
    Seq("SiO2", "Al2O3", "FeO", "MgO", "CaO", "TiO2"),
    Seq(Seq(50.00, 3.00, 15.00, 30.00, 1.50, 0.50),
      Seq(48.00, 5.00, 25.00, 18.00, 3.00, 1.00),
      Seq(52.00, 1.50, 8.00, 35.00, 1.00, 0.20)))

  lazy val muscoviteMulti = frame(
    Seq("SiO2", "Al2O3", "FeO", "MgO", "TiO2", "Na2O", "K2O", "BaO"),
    Seq(Seq(45.00, 35.00, 3.00, 1.00, 0.50, 0.50, 10.00, 0.10),
      Seq(42.00, 30.00, 8.00, 3.00, 1.50, 0.30, 9.50, 0.20),
      Seq(48.00, 38.00, 1.50, 0.50, 0.30, 0.80, 11.00, 0.05)))

  lazy val biotiteMulti = frame(
    Seq("SiO2", "Al2O3", "FeO", "MgO", "K2O", "TiO2", "MnO", "Na2O", "BaO"),
    Seq(Seq(43.00, 12.50, 3.00, 28.00, 10.50, 1.00, 0.10, 0.10, 0.00),
      Seq(36.00, 14.00, 28.00, 5.00, 9.80, 3.50, 0.50, 0.05, 0.00),
      Seq(36.50, 17.50, 5.00, 18.00, 10.20, 1.00, 0.10, 0.10, 0.00)))

  lazy val stauroliteMulti = frame(
    Seq("SiO2", "Al2O3", "FeO", "MgO", "ZnO", "MnO", "TiO2"),
    Seq(Seq(28.0, 53.0, 13.0, 2.5, 1.5, 0.3, 0.7),
      Seq(29.0, 55.0, 5.0, 8.0, 0.2, 0.5, 0.3),
      Seq(27.5, 51.0, 10.0, 2.0, 7.0, 1.0, 0.5)))

  lazy val chlorite = frame(
    Seq("SiO2", "Al2O3", "FeO", "MgO", "Cr2O3", "TiO2"),
    Seq(Seq(26.0, 21.0, 20.0, 18.0, 0.1, 0.1)))

  lazy val chloriteMulti = frame(
    Seq("SiO2", "Al2O3", "FeO", "MgO", "Cr2O3", "TiO2"),
    Seq(Seq(26.0, 21.0, 8.0, 30.0, 0.1, 0.1),
      Seq(24.0, 22.0, 28.0, 10.0, 0.2, 0.3),
      Seq(30.0, 28.0, 5.0, 20.0, 0.0, 0.1)))

  lazy val epidote = frame(
    Seq("SiO2", "Al2O3", "FeO", "CaO", "MnO", "TiO2"),
    Seq(Seq(37.5, 23.0, 12.5, 22.5, 0.2, 0.1)))

  lazy val epidoteMulti = frame(
    Seq("SiO2", "Al2O3", "FeO", "CaO", "MnO", "TiO2"),
    Seq(Seq(37.5, 23.0, 12.5, 22.5, 0.2, 0.1),
      Seq(38.5, 30.0, 2.0, 23.5, 0.1, 0.1),
      Seq(36.0, 20.0, 8.0, 21.0, 12.0, 0.3)))

  lazy val amphiboleMulti = frame(
    Seq("SiO2", "TiO2", "Al2O3", "FeO", "MgO", "CaO", "Na2O", "K2O", "MnO", "Cr2O3"),
    Seq(Seq(43.0, 1.5, 11.0, 12.0, 13.0, 11.5, 1.5, 0.8, 0.2, 0.1),
      Seq(54.0, 0.2, 2.5, 8.0, 20.0, 12.0, 0.5, 0.1, 0.1, 0.0),
      Seq(56.0, 0.1, 9.0, 10.0, 14.0, 2.0, 6.5, 0.1, 0.1, 0.0)))

  lazy val titanite = frame(
    Seq("SiO2", "TiO2", "Al2O3", "FeO", "CaO", "MnO", "MgO"),
    Seq(Seq(30.48, 40.83, 0.00, 0.00, 28.69, 0.00, 0.00)))

  lazy val titaniteMulti = frame(
    Seq("SiO2", "TiO2", "Al2O3", "FeO", "CaO", "MnO", "MgO", "SnO2", "Nb2O5"),
    Seq(Seq(30.48, 40.83, 0.00, 0.00, 28.69, 0.00, 0.00, 0.00, 0.00),
      Seq(29.50, 35.00, 6.00, 0.50, 28.00, 0.10, 0.05, 0.00, 0.00),
      Seq(30.00, 36.00, 1.50, 4.00, 28.50, 0.20, 0.10, 0.00, 0.00)))

  lazy val titaniteSn = frame(
    Seq("SiO2", "TiO2", "Al2O3", "FeO", "CaO", "SnO2", "MnO", "MgO"),
    Seq(Seq(28.00, 25.00, 1.00, 0.50, 27.00, 15.00, 0.00, 0.00)))

  lazy val chloritoid = frame(
    Seq("SiO2", "Al2O3", "FeO", "MgO", "MnO", "TiO2"),
    Seq(Seq(24.5, 39.5, 22.0, 5.0, 3.0, 0.3)))

  lazy val chloritoidMulti = frame(
    Seq("SiO2", "Al2O3", "FeO", "MgO", "MnO", "TiO2"),
    Seq(Seq(24.5, 39.5, 22.0, 5.0, 3.0, 0.3),
      Seq(25.0, 40.0, 8.0, 18.0, 1.0, 0.5),
      Seq(23.0, 38.0, 18.0, 3.0, 14.0, 0.2)))

  lazy val cordierite = frame(
    Seq("SiO2", "Al2O3", "FeO", "MgO", "MnO", "Na2O", "K2O", "CaO"),
    Seq(Seq(48.0, 32.5, 5.0, 10.5, 0.3, 0.5, 0.1, 0.1)))

  lazy val cordieriteMulti = frame(
    Seq("SiO2", "Al2O3", "FeO", "MgO", "MnO", "Na2O", "K2O", "CaO"),
    Seq(Seq(48.0, 32.5, 5.0, 10.5, 0.3, 0.5, 0.1, 0.1),
      Seq(47.0, 31.0, 14.0, 3.0, 0.5, 0.3, 0.1, 0.1),
      Seq(46.0, 30.0, 6.0, 8.0, 7.0, 0.4, 0.2, 0.1)))

  lazy val ilmenite = frame(
    Seq("SiO2", "TiO2", "Al2O3", "FeO", "MgO", "MnO", "Cr2O3"),
    Seq(Seq(0.00, 52.66, 0.00, 47.34, 0.00, 0.00, 0.00)))

  lazy val ilmeniteMulti = frame(
    Seq("SiO2", "TiO2", "Al2O3", "FeO", "MgO", "MnO", "Cr2O3"),
    Seq(Seq(0.00, 52.66, 0.00, 47.34, 0.00, 0.00, 0.00),
      Seq(0.00, 50.00, 0.00, 35.00, 14.00, 0.50, 0.00),
      Seq(0.00, 51.00, 0.00, 38.00, 0.50, 10.00, 0.00)))

  lazy val spinel = frame(
    Seq("SiO2", "TiO2", "Al2O3", "FeO", "Fe2O3", "Cr2O3", "MgO", "MnO", "ZnO"),
    Seq(Seq(0.00, 0.20, 55.00, 10.00, 3.00, 5.00, 25.00, 0.30, 0.50)))

  lazy val spinelMulti = frame(
    Seq("SiO2", "TiO2", "Al2O3", "FeO", "Fe2O3", "Cr2O3", "MgO", "MnO", "ZnO"),
    Seq(Seq(0.00, 0.20, 55.00, 10.00, 3.00, 5.00, 25.00, 0.30, 0.50),
      Seq(0.00, 0.50, 30.00, 25.00, 5.00, 3.00, 5.00, 0.20, 0.30),
      Seq(0.00, 0.30, 15.00, 15.00, 8.00, 45.00, 10.00, 0.10, 0.10)))

  lazy val graniteBulk = frame(
    Seq("SiO2", "TiO2", "Al2O3", "Fe2O3", "FeO", "MnO", "MgO", "CaO", "Na2O", "K2O", "P2O5"),
    Seq(Seq(72.0, 0.3, 14.0, 1.2, 1.8, 0.05, 0.7, 1.8, 3.2, 4.5, 0.12)))

  lazy val basaltBulk = frame(
    Seq("SiO2", "TiO2", "Al2O3", "Fe2O3", "FeO", "MnO", "MgO", "CaO", "Na2O", "K2O", "P2O5"),
    Seq(Seq(49.5, 2.0, 14.5, 3.5, 9.0, 0.18, 7.5, 10.5, 2.5, 0.4, 0.25)))

  lazy val dioriteBulk = frame(
    Seq("SiO2", "TiO2", "Al2O3", "Fe2O3", "FeO", "MnO", "MgO", "CaO", "Na2O", "K2O", "P2O5"),
    Seq(Seq(59.03, 0.7, 16.5, 2.5, 5.0, 0.12, 4.0, 6.5, 3.5, 2.0, 0.15)))

  // ---- garnet / garnetFe3 (test_minerals.py:89-135) ------------------------

  test("garnet_multi end members each sum to ~100 (test_minerals.py:93-97)") {
    val e = Minerals.endMembers(Minerals.Grt, garnetMulti)
    assert(e.count() == 3)
    sumsTo100(e, 1.0)
  }

  test("fe_garnet_multi GrtFe3 columns + sums (test_minerals.py:119-127)") {
    val e = Minerals.endMembers(Minerals.GrtFe3, feGarnetMulti)
    assert(e.columns.toSet == Set("Prp", "Alm", "Sps", "Grs", "Adr", "Uvr"))
    sumsTo100(e, 1.0)
  }

  // ---- feldspar / cpx (test_minerals.py:163-228) ---------------------------

  test("feldspar_multi end members sum to ~100 (test_minerals.py:163-167)") {
    val e = Minerals.endMembers(Minerals.Fsp, feldsparMulti)
    assert(e.count() == 3)
    sumsTo100(e, 1.0)
  }

  test("cpx T-site sum ~2 (test_minerals.py:199-203)") {
    val sf = Minerals.siteAllocations(Minerals.Cpx, cpxMulti.limit(1))
    assert(math.abs(siteSum(sf, "T").head - 2.0) < 0.1)
  }

  test("cr_clinopyroxene: Kosmochlor > 0, sum ~100 (test_minerals.py:218-223)") {
    val e = rows(Minerals.endMembers(Minerals.Cpx, crClinopyroxene)).head
    assert(e("Kosmochlor") > 0.0)
    assert(math.abs(e.values.sum - 100.0) < 2.0)
  }

  test("clinopyroxene_multi sums ~100 (test_minerals.py:224-228)") {
    sumsTo100(Minerals.endMembers(Minerals.Cpx, cpxMulti), 2.0)
  }

  // ---- orthopyroxene (test_minerals.py:237-256) ----------------------------

  test("opx apfu columns + end-member columns (test_minerals.py:237-256)") {
    val a = Minerals.apfu(Minerals.Opx, opxMulti)
    assert(Set("Si{4+}", "Al{3+}", "Mg{2+}", "Ca{2+}").subsetOf(a.columns.toSet))
    val e = Minerals.endMembers(Minerals.Opx, opxMulti)
    assert(Set("MgTs", "Wo", "En", "Fs") == e.columns.toSet)
    assert(e.count() == 3)
    noNegatives(e)
  }

  // ---- micas (test_minerals.py:265-374) ------------------------------------

  test("muscovite T-site sum ~4 per row (test_minerals.py:288-293)") {
    val sf = Minerals.siteAllocations(Minerals.Ms, muscoviteMulti)
    siteSum(sf, "T").foreach(v => assert(math.abs(v - 4.0) < 0.1, s"T=$v"))
  }

  test("muscovite end-member columns + sums ~100 (test_minerals.py:299-315)") {
    val e = Minerals.endMembers(Minerals.Ms, muscoviteMulti)
    assert(e.columns.toSet == Set("Al-Celadonite", "Fe-Al-Celadonite",
      "Pyrophyllite", "Margarite", "Paragonite", "Muscovite", "Trioctahedral"))
    sumsTo100(e, 1.0)
  }

  test("biotite T-site sum ~4 per row (test_minerals.py:345-350)") {
    val sf = Minerals.siteAllocations(Minerals.Bt, biotiteMulti)
    siteSum(sf, "T").foreach(v => assert(math.abs(v - 4.0) < 0.15, s"T=$v"))
  }

  test("biotite_multi end-member columns + sums ~100 (test_minerals.py:352-366)") {
    val e = Minerals.endMembers(Minerals.Bt, biotiteMulti)
    assert(e.columns.toSet == Set("Phlogopite", "Annite", "Eastonite",
      "Siderophyllite", "Dioctahedral"))
    sumsTo100(e, 1.0)
  }

  test("biotite_multi row 1 is annite-rich, row 2 eastonite-leaning (conftest:226-246)") {
    val e = rows(Minerals.endMembers(Minerals.Bt, biotiteMulti))
    assert(e(1)("Annite") > e(1)("Phlogopite"))
    assert(e(2)("Eastonite") > e(0)("Eastonite"))
  }

  // ---- staurolite (test_minerals.py:383-420) -------------------------------

  test("staurolite apfu no negatives; end members sum ~100 (test_minerals.py:396-416)") {
    noNegatives(Minerals.apfu(Minerals.St, stauroliteMulti))
    val e = Minerals.endMembers(Minerals.St, stauroliteMulti)
    assert(e.columns.toSet == Set("Fe-Staurolite", "Mg-Staurolite",
      "Zn-Staurolite", "Mn-Staurolite"))
    sumsTo100(e, 1.0)
  }

  test("staurolite rows are Fe-, Mg-, Zn-dominant in order (conftest:276-295)") {
    val e = rows(Minerals.endMembers(Minerals.St, stauroliteMulti))
    assert(e(0)("Fe-Staurolite") > e(0)("Mg-Staurolite"))
    assert(e(1)("Mg-Staurolite") > e(1)("Fe-Staurolite"))
    assert(e(2)("Zn-Staurolite") > 10.0)
  }

  // ---- chlorite (test_minerals.py:429-463) ---------------------------------

  test("chlorite 28-charge apfu positive; end members sum ~100 (test_minerals.py:439-459)") {
    val a = rows(Minerals.apfu(Minerals.Chl, chlorite)).head
    assert(a.values.sum > 0)
    val e = Minerals.endMembers(Minerals.Chl, chloriteMulti)
    assert(e.columns.toSet == Set("Clinochlore", "Chamosite", "Mg-Sudoite", "Fe-Sudoite"))
    sumsTo100(e, 1.0)
  }

  test("chlorite rows are clinochlore-, chamosite-dominant in order (conftest:300-318)") {
    val e = rows(Minerals.endMembers(Minerals.Chl, chloriteMulti))
    assert(e(0)("Clinochlore") > e(0)("Chamosite"))
    assert(e(1)("Chamosite") > e(1)("Clinochlore"))
  }

  // ---- epidote (test_minerals.py:472-518) ----------------------------------

  test("epidote reports Fe3+ only (test_minerals.py:482-489)") {
    val a = Minerals.apfu(Minerals.Ep, epidote)
    assert(a.columns.contains("Fe{3+}"))
    assert(!a.columns.contains("Fe{2+}"))
    assert(rows(a).head("Fe{3+}") > 0)
  }

  test("epidote_multi end members sum ~100; Al-dominant row is clinozoisite (test_minerals.py:500-514)") {
    val e = Minerals.endMembers(Minerals.Ep, epidoteMulti)
    assert(e.columns.toSet == Set("Clinozoisite", "Epidote", "Piemontite",
      "Mukhinite", "Tawmawite"))
    sumsTo100(e, 1.0)
    val r = rows(e)
    assert(r(1)("Clinozoisite") > r(1)("Epidote"))
    // MnO maps to Mn{2+}, never Mn{3+}, so Piemontite is 0 even for the
    // Mn-rich row — reference-verified (Ep.end_members row 2: Czo 77.9,
    // Ep 22.1, Pmt 0.0)
    assert(r(2)("Piemontite") == 0.0)
    assert(math.abs(r(0)("Clinozoisite") - 72.168) < 0.05)
    assert(math.abs(r(0)("Epidote") - 27.832) < 0.05)
  }

  test("amphibole hornblende row matches reference end-member values") {
    // golden from running the reference on the conftest amphibole fixture
    val r = rows(Minerals.endMembers(Minerals.Amp, amphiboleMulti)).head
    assert(math.abs(r("Tremolite") - 22.785) < 0.05, s"Trem = ${r("Tremolite")}")
    assert(math.abs(r("Edenite") - 33.5713) < 0.05, s"Ed = ${r("Edenite")}")
    assert(math.abs(r("Tschermakite") - 6.6689) < 0.05)
    assert(r("Richterite") == 0.0 && r("Glaucophane") == 0.0)
  }

  test("mn_garnet end members match reference values (low column keeps total Fe)") {
    val r = rows(Minerals.endMembers(Minerals.Grt, garnetMulti.limit(1))).head
    assert(math.abs(r("Alm") - 56.629276) < 0.01, s"Alm = ${r("Alm")}")
    assert(math.abs(r("Sps") - 34.411981) < 0.01, s"Sps = ${r("Sps")}")
    assert(math.abs(r("Prp") - 6.05668) < 0.01)
  }

  // ---- amphibole (test_minerals.py:527-594) --------------------------------

  test("amphibole T-site sum ~8 per row (test_minerals.py:556-561)") {
    val sf = Minerals.siteAllocations(Minerals.Amp, amphiboleMulti)
    siteSum(sf, "T").foreach(v => assert(math.abs(v - 8.0) < 0.5, s"T=$v"))
  }

  test("amphibole_multi end members sum ~100 (test_minerals.py:582-585)") {
    sumsTo100(Minerals.endMembers(Minerals.Amp, amphiboleMulti), 2.0)
  }

  test("actinolite row is tremolite-dominant (test_minerals.py:591-594)") {
    val r = rows(Minerals.endMembers(Minerals.Amp, amphiboleMulti))
    assert(r(1)("Tremolite") > 50.0, s"Tremolite = ${r(1)("Tremolite")}")
  }

  test("amphibole stoichiometry scoring runs with small staged plans") {
    val s = Stoich.checkStoichiometry(Minerals.Amp, amphiboleMulti)
    assert(s.count() == 3)
    val exprNodes = s.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.map(e => e.collect { case x => x }.size).sum
    }.sum
    assert(exprNodes < 5000, s"stoich plan blew up: $exprNodes expression nodes")
    rows(s).foreach(_.values.foreach(v => assert(v >= 0.0 && v <= 1.0 + 1e-9)))
  }

  // ---- titanite (test_minerals.py:603-676) ---------------------------------

  test("titanite reports Fe3+ only; T-site ~1 (test_minerals.py:619-644)") {
    val a = Minerals.apfu(Minerals.Ttn, titaniteMulti)
    assert(!a.columns.contains("Fe{2+}"))
    val sf = Minerals.siteAllocations(Minerals.Ttn, titaniteMulti)
    siteSum(sf, "T").foreach(v => assert(math.abs(v - 1.0) < 0.1, s"T=$v"))
  }

  test("ideal titanite Ttn > 95; Al/Fe rows; Sn-bearing Mal > 20 (test_minerals.py:656-672)") {
    val e = rows(Minerals.endMembers(Minerals.Ttn, titaniteMulti))
    assert(e(0)("Ttn") > 95.0)
    assert(e(1)("Al-Ttn") > 10.0)
    assert(e(2)("Fe-Ttn") > 5.0)
    val sn = rows(Minerals.endMembers(Minerals.Ttn, titaniteSn)).head
    assert(sn("Mal") > 20.0, s"Mal = ${sn("Mal")}")
    sumsTo100(Minerals.endMembers(Minerals.Ttn, titaniteMulti), 1.0)
  }

  // ---- chloritoid (test_minerals.py:685-743) -------------------------------

  test("chloritoid T-site ~2; end members sum ~100 (test_minerals.py:710-725)") {
    val sf = Minerals.siteAllocations(Minerals.Cld, chloritoidMulti)
    siteSum(sf, "T").foreach(v => assert(math.abs(v - 2.0) < 0.1, s"T=$v"))
    val e = Minerals.endMembers(Minerals.Cld, chloritoidMulti)
    assert(e.columns.toSet == Set("Cld", "Mgcld", "Mncld"))
    sumsTo100(e, 1.0)
  }

  test("chloritoid Fe/Mg/Mn dominance per row (test_minerals.py:731-743)") {
    val single = rows(Minerals.endMembers(Minerals.Cld, chloritoid)).head
    assert(single("Cld") > 60.0)
    val e = rows(Minerals.endMembers(Minerals.Cld, chloritoidMulti))
    assert(e(1)("Mgcld") > 60.0)
    assert(e(2)("Mncld") > 30.0)
  }

  // ---- cordierite (test_minerals.py:752-808) -------------------------------

  test("cordierite no Fe3+; T1-site ~6; end members sum ~100 (test_minerals.py:780-799)") {
    val a = Minerals.apfu(Minerals.Crd, cordieriteMulti)
    assert(!a.columns.contains("Fe{3+}"))
    val sf = Minerals.siteAllocations(Minerals.Crd, cordieriteMulti)
    siteSum(sf, "T1").foreach(v => assert(math.abs(v - 6.0) < 0.5, s"T1=$v"))
    val e = Minerals.endMembers(Minerals.Crd, cordieriteMulti)
    assert(e.columns.toSet == Set("H₂O-Crd", "Mg-Crd", "Fe-Crd", "Mn-Crd"))
    sumsTo100(e, 1.0)
  }

  test("cordierite Mg-dominant (test_minerals.py:805-808)") {
    val e = rows(Minerals.endMembers(Minerals.Crd, cordierite)).head
    assert(e("Mg-Crd") > 60.0, s"Mg-Crd = ${e("Mg-Crd")}")
  }

  // ---- ilmenite (test_minerals.py:817-860) ---------------------------------

  test("ilmenite end members sum ~100; ideal Ilm > 95 (test_minerals.py:839-850)") {
    val e = Minerals.endMembers(Minerals.Ilm, ilmeniteMulti)
    assert(e.columns.toSet == Set("Ilm", "Gk", "Pph", "Hem", "Chr"))
    sumsTo100(e, 1.0)
    val r = rows(e)
    assert(r(0)("Ilm") > 95.0)
    assert(r(1)("Gk") > 20.0) // geikielite row
    assert(r(2)("Pph") > 10.0) // pyrophanite row
  }

  // ---- spinel (test_minerals.py:869-927) -----------------------------------

  test("spinel apfu no negatives; end-member columns (test_minerals.py:883-908)") {
    noNegatives(Minerals.apfu(Minerals.Spl, spinelMulti))
    val e = Minerals.endMembers(Minerals.Spl, spinelMulti)
    assert(e.columns.toSet == Set("Spl", "Herc", "Chrm", "Mtc", "Gahn",
      "Frank", "Jac", "Ulv", "Spss"))
    assert(e.count() == 3)
  }

  test("spinel dominance per row: Spl, Herc, Chrm (test_minerals.py:914-927)") {
    val one = rows(Minerals.endMembers(Minerals.Spl, spinel)).head
    assert(one("Spl") > 50.0, s"Spl = ${one("Spl")}")
    val r = rows(Minerals.endMembers(Minerals.Spl, spinelMulti))
    assert(r(1)("Herc") > 10.0, s"Herc = ${r(1)("Herc")}")
    assert(r(2)("Chrm") > 50.0, s"Chrm = ${r(2)("Chrm")}")
  }

  // ---- bulk-rock CIPW + alumina saturation (test_bulk.py) ------------------

  test("granite CIPW has quartz + feldspars (test_bulk.py:296-306)") {
    val n = rows(Cipw.cipwNorm(graniteBulk, completeResults = true)).head
    assert(n("Q") > 0)
    assert(n("Or") + n("Ab") + n("An") > 50.0)
  }

  test("basalt CIPW has Di and Hy-or-Ol (test_bulk.py:307-317)") {
    val n = rows(Cipw.cipwNorm(basaltBulk, completeResults = true)).head
    assert(n("Di") > 0)
    assert(n("Hy") > 0 || n("Ol") > 0)
  }

  test("CIPW normsum totals ~100 for granite/basalt/diorite (test_bulk.py:318-327)") {
    Seq(graniteBulk, basaltBulk, dioriteBulk).foreach { b =>
      val n = rows(Cipw.cipwNorm(b, normsum = true, completeResults = true)).head
      assert(math.abs(n("Total") - 100.0) < 2.0, s"Total = ${n("Total")}")
    }
  }

  test("granite CIPW minerals non-negative (test_bulk.py:328-330)") {
    noNegatives(Cipw.cipwNorm(graniteBulk, completeResults = true))
  }

  test("granite peraluminous, basalt metaluminous (test_bulk.py:195-203)") {
    val g = rows(Convert.aluminaSaturation(graniteBulk)).head
    assert(g("A/CNK") > 1.0)
    val b = rows(Convert.aluminaSaturation(basaltBulk)).head
    assert(b("A/CNK") < 1.0 && b("A/NK") >= 1.0)
  }
}
