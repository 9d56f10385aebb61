package graft.petro

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Goldens produced by RUNNING the reference library on fixed inputs
  * (`PYTHONPATH=tools/refshim:/root/reference/src python3` — see
  * tools/refshim + tools/ref_bench.py): the values below are the
  * reference's outputs rounded as noted, so these tests pin
  * cross-implementation numeric parity, not just invariants. Shared
  * atomic masses (the shim uses this engine's tables), so any
  * disagreement is algorithmic. */
class ReferenceGoldenSpec extends AnyFunSuite {
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

  def approx(m: Map[String, Double], expect: Map[String, Double], tol: Double): Unit =
    expect.foreach { case (k, v) =>
      assert(math.abs(m(k) - v) < tol, s"$k: ${m(k)} vs reference $v")
    }

  lazy val graniteBulk = frame(
    Seq("SiO2", "TiO2", "Al2O3", "Fe2O3", "FeO", "MnO", "MgO", "CaO", "Na2O", "K2O", "P2O5"),
    Seq(Seq(72.0, 0.3, 14.0, 1.2, 1.8, 0.05, 0.7, 1.8, 3.2, 4.5, 0.12)))
  lazy val basaltBulk = frame(
    Seq("SiO2", "TiO2", "Al2O3", "Fe2O3", "FeO", "MnO", "MgO", "CaO", "Na2O", "K2O", "P2O5"),
    Seq(Seq(49.5, 2.0, 14.5, 3.5, 9.0, 0.18, 7.5, 10.5, 2.5, 0.4, 0.25)))

  test("granite CIPW norm matches reference values (_calc.cipw_norm)") {
    val n = row0(Cipw.cipwNorm(graniteBulk, completeResults = true))
    approx(n, Map(
      "Q" -> 30.7326, "C" -> 0.8793, "Or" -> 26.593, "Ab" -> 27.0771,
      "An" -> 8.146, "Hy" -> 3.6549, "Mt" -> 1.7399, "Il" -> 0.5699,
      "Ap" -> 0.2842, "Total" -> 99.6768), 5e-4)
  }

  test("basalt CIPW norm matches reference values (_calc.cipw_norm)") {
    val n = row0(Cipw.cipwNorm(basaltBulk, completeResults = true))
    approx(n, Map(
      "Q" -> 0.6265, "Or" -> 2.3638, "Ab" -> 21.154, "An" -> 27.1608,
      "Di" -> 18.9341, "Hy" -> 20.1401, "Mt" -> 5.0747, "Il" -> 3.7991,
      "Ap" -> 0.5921, "Total" -> 99.8452), 5e-4)
  }

  test("granite CIPWhb biotite recast matches reference (_calc.cipw_norm_hb)") {
    val n = row0(Cipw.cipwNormHb(graniteBulk, completeResults = true))
    approx(n, Map(
      "Q" -> 32.6466, "C" -> 0.8793, "Or" -> 23.6375, "Ab" -> 27.0771,
      "An" -> 8.146, "Bi" -> 4.6964, "Mt" -> 1.7399, "Il" -> 0.5699,
      "Ap" -> 0.2842, "Total" -> 99.6768), 5e-4)
  }

  test("CIPW cancrinite branch matches reference (CO2-bearing nephelinite)") {
    val neph = frame(
      Seq("SiO2", "TiO2", "Al2O3", "Fe2O3", "FeO", "MnO", "MgO", "CaO", "Na2O", "K2O", "P2O5", "CO2"),
      Seq(Seq(40.0, 2.5, 15.0, 5.0, 6.0, 0.2, 6.0, 12.0, 6.0, 3.0, 1.0, 2.0)))
    val n = row0(Cipw.cipwNorm(neph, normsum = true, cancrinite = true,
      completeResults = true))
    approx(n, Map("Or" -> 16.7501, "Ab" -> 4.4704, "An" -> 16.7973,
      "Ne" -> 16.1722, "Nc" -> 4.5508, "Di" -> 16.9367, "Ol" -> 6.4512,
      "Mt" -> 6.8494, "Il" -> 4.4868, "Ap" -> 2.2378, "Cc" -> 4.2974,
      "Total" -> 100.0), 5e-4)
  }

  test("CIPW spinel branch matches reference (peraluminous silica-poor)") {
    val per = frame(
      Seq("SiO2", "TiO2", "Al2O3", "Fe2O3", "FeO", "MnO", "MgO", "CaO", "Na2O", "K2O", "P2O5"),
      Seq(Seq(30.0, 0.5, 45.0, 2.0, 4.0, 0.1, 5.0, 1.0, 0.5, 0.3, 0.1)))
    val n = row0(Cipw.cipwNorm(per, normsum = true, spinel = true,
      completeResults = true))
    // the reference's own Di goes negative on this composition — pinned as-is
    approx(n, Map("Q" -> 40.9774, "Or" -> 2.4639, "Ab" -> 5.88,
      "An" -> 5.987, "Di" -> -27.9848, "Wo" -> 14.5129, "Mt" -> 4.0302,
      "Sp" -> 52.4842, "MgSp" -> 38.1099, "FeSp" -> 14.3744,
      "Total" -> 100.0), 5e-4)
    val off = row0(Cipw.cipwNorm(per, normsum = true, completeResults = true))
    approx(off, Map("Q" -> 16.1886, "C" -> 47.7637, "Hy" -> 19.7801), 5e-4)
  }

  test("CIPWhb hornblende recast on basalt matches reference") {
    val n = row0(Cipw.cipwNormHb(basaltBulk, normsum = true, completeResults = true))
    approx(n, Map("Ab" -> 21.557, "An" -> 28.1997, "Mt" -> 5.2688,
      "Il" -> 3.9444, "Ap" -> 0.6148, "Bi" -> 3.7731, "Hbl" -> 36.6422,
      "Total" -> 100.0), 5e-4)
  }

  test("mn_garnet stoichiometry scores match reference (check_stoichiometry)") {
    val mn = frame(Seq("SiO2", "Al2O3", "FeO", "MnO", "MgO", "CaO"),
      Seq(Seq(36.50, 20.50, 25.00, 15.00, 1.50, 1.00)))
    val s = row0(Stoich.checkStoichiometry(Minerals.Grt, mn))
    approx(s, Map(
      "analytical_total" -> 1.0, "cation_deviation" -> 0.994261,
      "charge_balance" -> 0.8134, "fe3+_validity" -> 1.0,
      "site_vacancies" -> 1.0, "leftover_cations" -> 0.994294), 5e-5)
  }

  test("metapelite TC garnet end members match reference (test_tc_minerals GARNET_DF)") {
    val g = frame(Seq("SiO2", "Al2O3", "FeO", "MgO", "CaO", "MnO"),
      Seq(Seq(38.5, 22.1, 28.3, 5.2, 3.8, 1.5)))
    val e = row0(graft.petro.hpxeos.Metapelite.TcGarnet.endMembers(g))
    approx(e, Map("py" -> 21.0872, "alm" -> 64.3813, "spss" -> 3.4561,
      "gr" -> 11.0755, "kho" -> 0.0), 5e-4)
  }

  test("pl4tr and k4tr agree and match reference (test_tc_minerals.py:179)") {
    val fsp = frame(Seq("SiO2", "Al2O3", "CaO", "Na2O", "K2O"),
      Seq(Seq(60.0, 25.0, 7.0, 6.5, 0.8)))
    val p = row0(graft.petro.hpxeos.Metapelite.TcPl4tr.endMembers(fsp))
    val k = row0(graft.petro.hpxeos.Metapelite.TcK4tr.endMembers(fsp))
    approx(p, Map("ab" -> 59.6619, "an" -> 35.5066, "san" -> 4.8315), 5e-4)
    Seq("ab", "an", "san").foreach { c =>
      assert(math.abs(p(c) - k(c)) < 1e-9, s"pl4tr/k4tr disagree on $c")
    }
  }

  test("muscovite end members match reference values (Ms.end_members)") {
    val ms = frame(Seq("SiO2", "Al2O3", "FeO", "MgO", "TiO2", "Na2O", "K2O", "BaO"),
      Seq(Seq(45.00, 35.00, 3.00, 1.00, 0.50, 0.50, 10.00, 0.10)))
    val e = row0(Minerals.endMembers(Minerals.Ms, ms))
    approx(e, Map("Al-Celadonite" -> 6.681, "Fe-Al-Celadonite" -> 11.244,
      "Pyrophyllite" -> 5.5561, "Margarite" -> 0.0, "Paragonite" -> 4.7257,
      "Muscovite" -> 62.1883, "Trioctahedral" -> 9.6048), 5e-4)
  }

  test("orthopyroxene end members match reference values (Opx.end_members)") {
    val opx = frame(Seq("SiO2", "Al2O3", "FeO", "MgO", "CaO", "TiO2"),
      Seq(Seq(50.00, 3.00, 15.00, 30.00, 1.50, 0.50)))
    val e = row0(Minerals.endMembers(Minerals.Opx, opx))
    approx(e, Map("MgTs" -> 0.0, "Wo" -> 5.8467, "En" -> 63.4267,
      "Fs" -> 30.7266), 5e-4)
  }

  test("TCbulk system variants match reference (KFMASH, NCKFMASHTOCr)") {
    import org.apache.spark.sql.functions.lit
    val avg = frame(
      Seq("SiO2", "Al2O3", "FeO", "MgO", "CaO", "Na2O", "K2O", "TiO2", "MnO"),
      Seq(Seq(59.8, 16.57, 5.81, 2.62, 2.17, 1.73, 3.53, 0.75, 0.1)))
    val (_, kf) = Thermo.tcBulk(avg, labelCol = lit("0"), system = "KFMASH")
    approx(row0(kf.drop("line")), Map(
      "H2O" -> 22.262, "SiO2" -> 57.683, "Al2O3" -> 9.419, "MgO" -> 3.767,
      "FeO" -> 4.687, "K2O" -> 2.172), 5e-4)
    val (_, cr) = Thermo.tcBulk(avg, labelCol = lit("0"), system = "NCKFMASHTOCr")
    approx(row0(cr.drop("line")), Map(
      "H2O" -> 21.791, "SiO2" -> 56.462, "Al2O3" -> 9.219, "MgO" -> 3.688,
      "FeO" -> 4.588, "K2O" -> 2.126, "Na2O" -> 1.583, "TiO2" -> 0.533,
      "O" -> 0.010, "Cr2O3" -> 0.0), 5e-4)
  }

  test("PerpleX component list matches reference lines (BulkAccessor.Perplexbulk)") {
    val avg = frame(
      Seq("SiO2", "Al2O3", "FeO", "MgO", "CaO", "Na2O", "K2O", "TiO2", "MnO"),
      Seq(Seq(59.8, 16.57, 5.81, 2.62, 2.17, 1.73, 3.53, 0.75, 0.1)))
    val block = Thermo.perplexBulk(avg).select("block").collect()(0).getString(0)
    val expect = Seq(
      "begin thermodynamic component list",
      "H2O   1 21.30414      0.00000      0.00000     molar amount",
      "SiO2  1 55.20033      0.00000      0.00000     molar amount",
      "Al2O3 1  9.01331      0.00000      0.00000     molar amount",
      "CaO   1  2.14618      0.00000      0.00000     molar amount",
      "MgO   1  3.60533      0.00000      0.00000     molar amount",
      "FeO   1  4.48516      0.00000      0.00000     molar amount",
      "K2O   1  2.07843      0.00000      0.00000     molar amount",
      "Na2O  1  1.54809      0.00000      0.00000     molar amount",
      "TiO2  1  0.52083      0.00000      0.00000     molar amount",
      "MnO   1  0.07818      0.00000      0.00000     molar amount",
      "O2    1  0.02000      0.00000      0.00000     molar amount",
      "end thermodynamic component list")
    assert(block.linesIterator.toSeq == expect)
  }

  test("MAGEMin bulk line matches reference (BulkAccessor.MAGEMin, db=mp)") {
    import org.apache.spark.sql.functions.lit
    val avg = frame(
      Seq("SiO2", "Al2O3", "FeO", "MgO", "CaO", "Na2O", "K2O", "TiO2", "MnO"),
      Seq(Seq(59.8, 16.57, 5.81, 2.62, 2.17, 1.73, 3.53, 0.75, 0.1)))
    val line = Thermo.magemim(avg, labelCol = lit("0"), db = "mp")
      .select("line").collect()(0).getString(0)
    assert(line ==
      "0;petropandas;mp;mol;[SiO2, Al2O3, CaO, MgO, FeO, K2O, Na2O, TiO2, O, MnO, H2O];" +
      "[55.2059, 9.0142, 2.1464, 3.6057, 4.4856, 2.0786, 1.5482, 0.5209, 0.0100, 0.0782, 21.3063];")
  }

  test("split_valence goldens for Fe/Mn/Ti, both methods (test_calc.py:114-168)") {
    import graft.petro.{Convert, Valence, Units}
    val fePyroxene = frame(Seq("SiO2", "Al2O3", "FeO", "MgO", "CaO", "Na2O", "TiO2"),
      Seq(Seq(52.00, 4.50, 8.50, 15.00, 18.00, 1.50, 0.50)))
    val mnGarnet = frame(Seq("SiO2", "Al2O3", "FeO", "MnO", "MgO", "CaO"),
      Seq(Seq(36.50, 20.50, 25.00, 15.00, 1.50, 1.00)))
    val tiRutile = frame(Seq("SiO2", "Al2O3", "FeO", "MgO", "CaO", "TiO2", "Na2O"),
      Seq(Seq(40.00, 12.00, 10.00, 8.00, 10.00, 18.00, 2.00)))
    def run(df: DataFrame, el: String, method: String, nOxy: Double, ic: Double,
        expect: Map[String, Double]): Unit = {
      val apfu = Convert.toApfu(df, nOxygens = Some(nOxy), units = Units.WtPct)
      val out = Valence.splitValence(apfu, apfu.columns.toSeq, el, method, nOxy, ic)
      approx(row0(out).filter(_._1.contains(el)), expect, 5e-7)
    }
    // low column keeps the TOTAL; high is the method estimate (reference run)
    run(fePyroxene, "Fe", "droop", 6, 4,
      Map("Fe{2+}" -> 0.261797, "Fe{3+}" -> 0.080332))
    run(fePyroxene, "Fe", "schumacher", 6, 4,
      Map("Fe{2+}" -> 0.261797, "Fe{3+}" -> 0.080873))
    run(mnGarnet, "Mn", "droop", 12, 8,
      Map("Mn{2+}" -> 1.043088, "Mn{3+}" -> 0.034422))
    run(mnGarnet, "Mn", "schumacher", 12, 8,
      Map("Mn{2+}" -> 1.043088, "Mn{3+}" -> 0.034472))
    run(tiRutile, "Ti", "droop", 6, 4,
      Map("Ti{4+}" -> 0.503904, "Ti{3+}" -> 0.0))
    run(tiRutile, "Ti", "schumacher", 6, 4,
      Map("Ti{4+}" -> 0.503904, "Ti{3+}" -> 0.0))
  }

  test("cation-basis APFU matches reference and round-trips (to_apfu(n_cations=8))") {
    import graft.petro.{Convert, Units}
    import org.apache.spark.sql.functions.col
    val mn = frame(Seq("SiO2", "Al2O3", "FeO", "MnO", "MgO", "CaO"),
      Seq(Seq(36.50, 20.50, 25.00, 15.00, 1.50, 1.00)))
    val a = Convert.toApfu(mn, nCations = Some(8.0), units = Units.WtPct)
    approx(row0(a), Map(
      "Si{4+}" -> 2.992406, "Al{3+}" -> 1.980765, "Fe{2+}" -> 1.714071,
      "Mn{2+}" -> 1.041592, "Mg{2+}" -> 0.183325, "Ca{2+}" -> 0.08784), 5e-7)
    val total = mn.columns.map(col).reduce(_ + _)
    val withTotal = mn.withColumn("__t", total)
    val a2 = Convert.toApfu(withTotal, nCations = Some(8.0), carry = Seq("__t"))
    val back = Convert.fromApfu(a2, nCations = Some(8.0),
      total = Some(col("__t")), carry = Seq("__t")).drop("__t")
    val orig = row0(mn)
    row0(back).foreach { case (k, v) =>
      assert(math.abs(v - orig(k)) < 1e-6, s"$k: $v vs ${orig(k)}")
    }
  }

  test("MAGEMin db variants match reference (ig, um, mtl)") {
    import org.apache.spark.sql.functions.lit
    val avg = frame(
      Seq("SiO2", "Al2O3", "FeO", "MgO", "CaO", "Na2O", "K2O", "TiO2", "MnO"),
      Seq(Seq(59.8, 16.57, 5.81, 2.62, 2.17, 1.73, 3.53, 0.75, 0.1)))
    def line(db: String): String =
      Thermo.magemim(avg, labelCol = lit("0"), db = db)
        .select("line").collect()(0).getString(0)
    assert(line("ig") ==
      "0;petropandas;ig;mol;[SiO2, Al2O3, CaO, MgO, FeO, K2O, Na2O, TiO2, O, Cr2O3, H2O];" +
      "[55.2491, 9.0213, 2.1481, 3.6085, 4.4891, 2.0803, 1.5495, 0.5213, 0.0100, 0.0000, 21.3229];")
    assert(line("um") ==
      "0;petropandas;um;mol;[SiO2, Al2O3, MgO, FeO, O, H2O, S];" +
      "[58.9636, 9.6278, 3.8511, 4.7909, 0.0100, 22.7565, 0.0000];")
    assert(line("mtl") ==
      "0;petropandas;mtl;mol;[SiO2, Al2O3, CaO, MgO, FeO, Na2O];" +
      "[72.6263, 11.8587, 2.8237, 4.7435, 5.9011, 2.0368];")
  }

  test("TCbulk prep matches reference values (BulkAccessor.TCbulk, avgpelite-like)") {
    val avg = frame(
      Seq("SiO2", "Al2O3", "FeO", "MgO", "CaO", "Na2O", "K2O", "TiO2", "MnO"),
      Seq(Seq(59.8, 16.57, 5.81, 2.62, 2.17, 1.73, 3.53, 0.75, 0.1)))
    val (_, lined) = Thermo.tcBulk(avg, labelCol = lit("0"))
    val m = row0(lined.drop("line"))
    approx(m, Map(
      "H2O" -> 21.306, "SiO2" -> 55.206, "Al2O3" -> 9.014, "CaO" -> 2.146,
      "MgO" -> 3.606, "FeO" -> 4.486, "K2O" -> 2.079, "Na2O" -> 1.548,
      "TiO2" -> 0.521, "MnO" -> 0.078, "O" -> 0.010), 5e-4)
  }
}
