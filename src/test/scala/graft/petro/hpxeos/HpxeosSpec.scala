package graft.petro.hpxeos

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Parity with reference tests/test_tc_minerals.py (metapelite garnet +
  * biotite) plus polynomial-DSL unit checks. */
class HpxeosSpec extends AnyFunSuite {
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

  val gCols = Seq("SiO2", "Al2O3", "FeO", "MgO", "CaO", "MnO")
  lazy val garnetDf = frame(gCols, Seq(Seq(38.5, 22.1, 28.3, 5.2, 3.8, 1.5)))
  lazy val garnetFe = frame(gCols, Seq(Seq(38.0, 21.5, 32.0, 3.0, 4.0, 1.0)))
  lazy val garnetMg = frame(gCols, Seq(Seq(42.0, 23.0, 10.0, 20.0, 4.0, 0.5)))

  test("partition of unity: all 39 phases sum to 100 at default AND random order states") {
    // the axfile p(...) polynomials partition unity algebraically, so the
    // sum must hold for ANY composition/order state that yields finite
    // site fractions — one broad EMPA-ish composition covers every set
    val oxCols = Seq("SiO2", "TiO2", "Al2O3", "Fe2O3", "FeO", "MnO",
      "MgO", "CaO", "Na2O", "K2O", "Cr2O3")
    val comp = frame(oxCols,
      Seq(Seq(42.0, 1.5, 14.0, 2.0, 11.0, 0.4, 12.0, 9.5, 2.2, 1.2, 0.4),
        Seq(50.0, 0.8, 9.0, 1.0, 8.0, 0.2, 16.0, 10.0, 1.5, 0.6, 0.2)))
    val rng = new scala.util.Random(7)
    Hpxeos.all.foreach { phase =>
      val randomOps = phase.orderParameterNames
        .map(n => n -> Left(rng.nextDouble() * 0.2 - 0.1)).toMap
      Seq(Map.empty[String, Either[Double, org.apache.spark.sql.Column]],
        randomOps).foreach { ops =>
        // validate=true is the built-in sum-to-1 gate at 1e-8
        val e = phase.endMembers(comp, orderParameters = ops, validate = true)
        assert(e.count() == 2, s"${phase.abbreviation} at ops=$ops")
      }
    }
  }

  test("polynomial DSL parses fraction tokens and comments") {
    val ps = Poly.parse("foo 1 1  1/2  2  -1/2  f  -1/2  y  % comment\nbar 1 1 0 1 1 x")
    assert(ps.map(_._1) == Seq("foo", "bar"))
    val foo = ps.head._2
    assert(foo.head.head.const == 0.5)
    assert(foo.head.head.pairs == Seq((-0.5, "f"), (-0.5, "y")))
  }

  test("TC_g columns and sum to 100 (test_tc_minerals.py:77-84)") {
    val e = Metapelite.TcGarnet.endMembers(garnetDf, validate = true)
    assert(e.columns.toSeq == Seq("py", "alm", "spss", "gr", "kho"))
    val m = row0(e)
    assert(math.abs(m.values.sum - 100.0) < 0.01, s"sum=${m.values.sum}")
  }

  test("TC_g fe-rich alm>py; mg-rich py>alm (test_tc_minerals.py:86-93)") {
    val fe = row0(Metapelite.TcGarnet.endMembers(garnetFe))
    assert(fe("alm") > fe("py"))
    val mg = row0(Metapelite.TcGarnet.endMembers(garnetMg))
    assert(mg("py") > mg("alm"))
  }

  val biCols = Seq("SiO2", "Al2O3", "FeO", "MgO", "K2O", "TiO2", "MnO")
  lazy val biotiteDf = frame(biCols, Seq(Seq(36.5, 17.0, 18.0, 11.0, 9.8, 2.5, 0.3)))

  test("TC_bi sums to 100 with default Q=0 (test_tc_minerals.py biotite)") {
    val e = Metapelite.TcBiotite.endMembers(biotiteDf, validate = true)
    assert(e.columns.toSeq == Seq("phl", "annm", "obi", "east", "tbi", "fbi", "mmbi"))
    val m = row0(e)
    assert(math.abs(m.values.sum - 100.0) < 0.01, s"sum=${m.values.sum}")
  }

  test("TC_bi accepts order parameter Q (test_tc_minerals.py:404)") {
    val e0 = row0(Metapelite.TcBiotite.endMembers(biotiteDf))
    val eq = row0(Metapelite.TcBiotite.endMembers(biotiteDf,
      orderParameters = Map("Q" -> Left(0.2)), validate = true))
    assert(math.abs(eq.values.sum - 100.0) < 0.01)
    assert(math.abs(eq("obi") - e0("obi")) > 1e-6) // Q moves ordered biotite
  }

  test("sf-block transcription check: garnet site occupancies sum to 1 per site") {
    import org.apache.spark.sql.functions._
    val apfu = graft.petro.Minerals.rawApfu(Metapelite.TcGarnet.mineral, garnetDf)
    val props = Metapelite.TcGarnet.proportions(apfu)
    // rebuild the variables frame and evaluate the sf block
    val varsDf = {
      val comp = (c: String) => if (apfu.columns.contains(c)) col(c) else lit(0.0)
      val xTot = Seq("Mg{2+}", "Fe{2+}", "Mn{2+}", "Ca{2+}").map(comp).reduce(_ + _)
      val yTot = Seq("Al{3+}", "Fe{3+}").map(comp).reduce(_ + _)
      apfu.select(
        (comp("Fe{2+}") / xTot / (comp("Fe{2+}") / xTot + comp("Mg{2+}") / xTot)).as("x"),
        (comp("Ca{2+}") / xTot).as("z"), (comp("Mn{2+}") / xTot).as("m"),
        (comp("Fe{3+}") / yTot).as("f"))
    }
    val occ = row0(Metapelite.TcGarnet.siteOccupancies(varsDf))
    val xSum = occ("xMgX") + occ("xFeX") + occ("xMnX") + occ("xCaX")
    val ySum = occ("xAlY") + occ("xFe3Y")
    assert(math.abs(xSum - 1.0) < 1e-9 && math.abs(ySum - 1.0) < 1e-9)
    assert(props.count() == 1)
  }

  test("pl4tr and k4tr agree on shared compositions (test_tc_minerals.py:179)") {
    val fsp = frame(Seq("SiO2", "Al2O3", "CaO", "Na2O", "K2O"),
      Seq(Seq(62.0, 24.0, 5.5, 7.5, 1.0), Seq(66.0, 19.0, 0.5, 4.0, 10.0)))
    val pl = Metapelite.TcPl4tr.endMembers(fsp, validate = true).collect()
    val kf = Metapelite.TcK4tr.endMembers(fsp, validate = true).collect()
    for (i <- pl.indices; j <- 0 until 3)
      assert(math.abs(pl(i).getDouble(j) - kf(i).getDouble(j)) < 1e-9)
  }

  test("ctd, st, cd proportions sum to 100 (test_tc_minerals.py sums)") {
    val ctd = frame(Seq("SiO2", "Al2O3", "FeO", "MgO", "MnO"),
      Seq(Seq(24.5, 40.5, 22.0, 3.0, 0.5)))
    val e1 = row0(Metapelite.TcChloritoid.endMembers(ctd, validate = true))
    assert(math.abs(e1.values.sum - 100.0) < 0.01)
    val st = frame(Seq("SiO2", "Al2O3", "FeO", "MgO", "MnO", "TiO2"),
      Seq(Seq(27.5, 54.0, 13.0, 1.8, 0.3, 0.5)))
    val e2 = row0(Metapelite.TcStaurolite.endMembers(st, validate = true))
    assert(math.abs(e2.values.sum - 100.0) < 0.01)
    val cd = frame(Seq("SiO2", "Al2O3", "FeO", "MgO", "MnO"),
      Seq(Seq(48.5, 33.0, 8.0, 8.5, 0.3)))
    val e3 = row0(Metapelite.TcCordierite.endMembers(cd,
      orderParameters = Map("h" -> Left(0.5)), validate = true))
    assert(math.abs(e3.values.sum - 100.0) < 0.01)
    assert(math.abs(e3("hcrd") - 50.0) < 1e-6)
  }

  test("mu and ma (shared mica model) sum to 100; agree up to relabeling") {
    val mica = frame(Seq("SiO2", "Al2O3", "FeO", "MgO", "K2O", "Na2O", "CaO"),
      Seq(Seq(46.0, 34.0, 1.5, 1.0, 10.0, 1.0, 0.3)))
    val mu = row0(Metapelite.TcMuscovite.endMembers(mica, validate = true))
    assert(math.abs(mu.values.sum - 100.0) < 0.01)
    assert(mu("pa") < mu.values.max) // Na member subordinate in K-mica
    val ma = row0(Metapelite.TcMargarite.endMembers(mica, validate = true))
    // same model, relabeled end members
    assert(math.abs(ma("mut") - mu("mu")) < 1e-9)
    assert(math.abs(ma("ma") - mu("mat")) < 1e-9)
  }

  test("chl (28-charge basis, QAl/Q1/Q4) sums to 100 at any order state") {
    val chl = frame(Seq("SiO2", "Al2O3", "FeO", "MgO", "MnO"),
      Seq(Seq(26.0, 21.0, 20.0, 18.0, 0.2)))
    val e0 = row0(Metapelite.TcChlorite.endMembers(chl, validate = true))
    assert(math.abs(e0.values.sum - 100.0) < 0.01)
    val eq = row0(Metapelite.TcChlorite.endMembers(chl,
      orderParameters = Map("QAl" -> Left(0.2), "Q1" -> Left(0.1), "Q4" -> Left(-0.1)),
      validate = true))
    assert(math.abs(eq.values.sum - 100.0) < 0.01)
    assert(math.abs(eq("clin") - e0("clin")) > 1e-9) // order state moves members
  }

  test("ep and opx sum to 100; order parameters accepted") {
    val ep = frame(Seq("SiO2", "Al2O3", "FeO", "CaO"),
      Seq(Seq(38.0, 27.0, 8.0, 23.5)))
    val e = row0(Metapelite.TcEpidote.endMembers(ep, validate = true))
    assert(math.abs(e.values.sum - 100.0) < 0.01)
    val eq = row0(Metapelite.TcEpidote.endMembers(ep,
      orderParameters = Map("Q" -> Left(0.1)), validate = true))
    assert(eq("ep") > e("ep")) // ordering moves Fe3+ onto M3 -> more ep
    val opx = frame(Seq("SiO2", "Al2O3", "FeO", "MgO", "CaO", "MnO"),
      Seq(Seq(52.0, 4.0, 18.0, 24.0, 1.2, 0.4)))
    val o = row0(Metapelite.TcOrthopyroxene.endMembers(opx, validate = true))
    assert(math.abs(o.values.sum - 100.0) < 0.01)
    assert(o("en") > o("fs")) // Mg-rich opx
  }

  test("TC_hb (11 members, z/a/k/Q1/Q2) sums to 100 at any order state") {
    // tremolitic amphibole, near-ideal Ca2Mg5Si8O22(OH)2
    val amp = frame(Seq("SiO2", "Al2O3", "FeO", "MgO", "CaO", "Na2O", "K2O", "TiO2"),
      Seq(Seq(55.0, 2.5, 4.0, 22.0, 12.5, 0.6, 0.15, 0.2)))
    val e = row0(Metabasite.TcAmphibole.endMembers(amp, validate = true))
    assert(e.size == 11)
    assert(math.abs(e.values.sum - 100.0) < 0.01, s"sum=${e.values.sum}")
    assert(e("tr") > 50.0) // tremolite-dominant
    val eo = row0(Metabasite.TcAmphibole.endMembers(amp,
      orderParameters = Map("z" -> Left(0.05), "a" -> Left(0.1),
        "k" -> Left(0.3), "Q1" -> Left(0.02), "Q2" -> Left(-0.02)),
      validate = true))
    assert(math.abs(eo.values.sum - 100.0) < 0.01)
    assert(eo("prgm") > 0 && eo("kprg") > 0) // A-site occupancy activates
  }

  test("ilmm, sp, mt1, sa sum to 100 (Fe-Ti oxides + sapphirine)") {
    val ilm = frame(Seq("TiO2", "FeO", "MgO", "MnO"),
      Seq(Seq(50.0, 45.0, 2.0, 1.5)))
    val e1 = row0(Metapelite.TcIlmeniteMixed.endMembers(ilm,
      orderParameters = Map("Q" -> Left(0.8)), validate = true))
    assert(math.abs(e1.values.sum - 100.0) < 0.01)
    val sp = frame(Seq("Al2O3", "FeO", "MgO", "TiO2"),
      Seq(Seq(55.0, 25.0, 16.0, 1.0)))
    val e2 = row0(Metapelite.TcSpinel.endMembers(sp, validate = true))
    assert(math.abs(e2.values.sum - 100.0) < 0.01)
    assert(e2("sp") + e2("herc") > 50.0) // aluminous spinel
    // magnetite: composition-dependent default Q = 2x/(2+x)
    val mt = frame(Seq("FeO", "TiO2"), Seq(Seq(85.0, 8.0)))
    val e3 = row0(Metapelite.TcMagnetite.endMembers(mt, validate = true))
    assert(math.abs(e3.values.sum - 100.0) < 0.01)
    assert(e3("usp") > 0)
    val sa = frame(Seq("SiO2", "Al2O3", "FeO", "MgO"),
      Seq(Seq(13.0, 62.0, 8.0, 16.0)))
    val e4 = row0(Metapelite.TcSapphirine.endMembers(sa, validate = true))
    assert(math.abs(e4.values.sum - 100.0) < 0.01)
  }

  test("ilm + C-1 feldspars complete the metapelite set (19 phases)") {
    assert(Metapelite.phases.length == 19)
    val ilm = frame(Seq("TiO2", "FeO"), Seq(Seq(51.0, 46.0)))
    val e = row0(Metapelite.TcIlmenite.endMembers(ilm,
      orderParameters = Map("Q" -> Left(0.5)), validate = true))
    assert(math.abs(e.values.sum - 100.0) < 0.01)
    val fsp = frame(Seq("SiO2", "Al2O3", "CaO", "Na2O", "K2O"),
      Seq(Seq(62.0, 24.0, 5.5, 7.5, 1.0)))
    val plc = row0(Metapelite.TcPlagioclaseCbar1.endMembers(fsp, validate = true))
    val ksp = row0(Metapelite.TcKFeldsparCbar1.endMembers(fsp, validate = true))
    // same single-site model, different parameterisation: must agree
    Seq("abh", "anC", "san").foreach(n =>
      assert(math.abs(plc(n) - ksp(n)) < 1e-9, n))
  }

  test("metabasite ol, abc, pli sum to 100") {
    val ol = frame(Seq("SiO2", "FeO", "MgO"), Seq(Seq(40.0, 12.0, 48.0)))
    val e1 = row0(Metabasite.TcOlivine.endMembers(ol, validate = true))
    assert(math.abs(e1.values.sum - 100.0) < 0.01)
    assert(e1("fo") > e1("fa")) // forsteritic
    val ab = frame(Seq("SiO2", "Al2O3", "CaO", "Na2O"),
      Seq(Seq(66.0, 21.0, 2.5, 10.0)))
    val e2 = row0(Metabasite.TcPeristerite.endMembers(ab, validate = true))
    assert(math.abs(e2.values.sum - 100.0) < 0.01)
    assert(e2("abm") > 80.0) // albitic
    val fsp = frame(Seq("SiO2", "Al2O3", "CaO", "Na2O", "K2O"),
      Seq(Seq(62.0, 24.0, 5.5, 7.5, 1.0)))
    val e3 = row0(Metabasite.TcPlagioclaseIbar1.endMembers(fsp, validate = true))
    assert(math.abs(e3.values.sum - 100.0) < 0.01)
  }

  // ---- metabasite aug/dio + Mn-free phases (test_tc_minerals.py) ----------

  // CPX_DF fixture (test_tc_minerals.py:417-428)
  lazy val cpxDf = frame(Seq("SiO2", "Al2O3", "FeO", "MgO", "CaO", "Na2O", "TiO2"),
    Seq(Seq(50.0, 5.0, 8.0, 12.0, 20.0, 3.0, 0.5)))

  test("metabasite aug (Qfm,Qal) sums to 100 at any order state") {
    val e = row0(Metabasite.TcAugite.endMembers(cpxDf, validate = true))
    assert(e.size == 8)
    assert(math.abs(e.values.sum - 100.0) < 0.01, s"sum=${e.values.sum}")
    val eo = row0(Metabasite.TcAugite.endMembers(cpxDf,
      orderParameters = Map("Qfm" -> Left(0.1), "Qal" -> Left(0.05)),
      validate = true))
    assert(math.abs(eo.values.sum - 100.0) < 0.01)
    assert(math.abs(eo("ocats") - 5.0) < 1e-6) // ocats = Qal directly
    assert(math.abs(eo("fmc") - e("fmc")) > 1e-9)
  }

  test("metabasite dio (Q,Qaf,Qfm) sums to 100; di-dominant for calcic cpx") {
    val e = row0(Metabasite.TcOmphacite.endMembers(cpxDf, validate = true))
    assert(e.size == 7)
    assert(math.abs(e.values.sum - 100.0) < 0.01, s"sum=${e.values.sum}")
    assert(e("di") > e("jd")) // Ca >> Na here
    val eo = row0(Metabasite.TcOmphacite.endMembers(cpxDf,
      orderParameters = Map("Q" -> Left(0.1), "Qaf" -> Left(0.02), "Qfm" -> Left(-0.05)),
      validate = true))
    assert(math.abs(eo.values.sum - 100.0) < 0.01)
    assert(math.abs(eo("om") - 20.0) < 1e-6) // om = 2Q
  }

  test("metabasite Mn-free g/bi/mu agree with shapes of metapelite models") {
    val g = row0(Metabasite.TcGarnet.endMembers(garnetDf, validate = true))
    assert(g.keySet == Set("py", "alm", "gr", "kho"))
    assert(math.abs(g.values.sum - 100.0) < 0.01)
    assert(g("alm") > g("py")) // Fe-rich fixture
    val bi = row0(Metabasite.TcBiotite.endMembers(biotiteDf, validate = true))
    assert(math.abs(bi.values.sum - 100.0) < 0.01)
    val mica = frame(Seq("SiO2", "Al2O3", "FeO", "MgO", "K2O", "Na2O", "CaO"),
      Seq(Seq(46.0, 34.0, 1.5, 1.0, 10.0, 1.0, 0.3)))
    val mu = row0(Metabasite.TcMuscovite.endMembers(mica, validate = true))
    val muP = row0(Metapelite.TcMuscovite.endMembers(mica))
    assert(math.abs(mu.values.sum - 100.0) < 0.01)
    // identical model, Ca member relabeled mam (muscovite.py:1-8)
    assert(math.abs(mu("mam") - muP("mat")) < 1e-9)
    assert(math.abs(mu("mu") - muP("mu")) < 1e-9)
  }

  test("metabasite Mn-free chl/opx/ilmm sum to 100 at any order state") {
    val chl = frame(Seq("SiO2", "Al2O3", "FeO", "MgO"),
      Seq(Seq(26.0, 21.0, 20.0, 18.0)))
    val e0 = row0(Metabasite.TcChlorite.endMembers(chl, validate = true))
    assert(math.abs(e0.values.sum - 100.0) < 0.01)
    val eq = row0(Metabasite.TcChlorite.endMembers(chl,
      orderParameters = Map("QAl" -> Left(0.2), "Q1" -> Left(0.1), "Q4" -> Left(-0.1)),
      validate = true))
    assert(math.abs(eq.values.sum - 100.0) < 0.01)
    val opx = frame(Seq("SiO2", "Al2O3", "FeO", "MgO", "CaO"),
      Seq(Seq(52.0, 4.0, 18.0, 24.0, 1.2)))
    val o = row0(Metabasite.TcOrthopyroxene.endMembers(opx, validate = true))
    assert(math.abs(o.values.sum - 100.0) < 0.01)
    assert(o("en") > o("fs"))
    val ilm = frame(Seq("TiO2", "FeO", "MgO"), Seq(Seq(50.0, 45.0, 2.0)))
    val i = row0(Metabasite.TcIlmeniteMixed.endMembers(ilm,
      orderParameters = Map("Q" -> Left(0.8)), validate = true))
    assert(math.abs(i.values.sum - 100.0) < 0.01)
    assert(Metabasite.phases.length == 12)
  }

  // ---- igneous axfile set (test_tc_minerals.py igneous + new coverage) ----

  test("igneous g_W24 (Cr/Ti end-members) sums to 100 (GARNET_IG_DF)") {
    val g = frame(Seq("SiO2", "Al2O3", "Cr2O3", "TiO2", "FeO", "MgO", "CaO"),
      Seq(Seq(38.5, 22.1, 0.0, 0.0, 28.3, 5.2, 3.8),
        Seq(40.0, 20.0, 2.5, 1.0, 18.0, 12.0, 5.5)))
    val e = Igneous.TcGarnetW24.endMembers(g, validate = true)
    assert(e.columns.toSeq == Seq("py", "alm", "gr", "andr", "knor", "tig"))
    e.collect().foreach { r =>
      val s = (0 until 6).map(r.getDouble).sum
      assert(math.abs(s - 100.0) < 0.01, s"sum=$s")
    }
    val cr = row0(e.where(org.apache.spark.sql.functions.col("knor") > 0))
    assert(cr("knor") > 0 && cr("tig") > 0) // Cr/Ti row activates new members
  }

  test("igneous cpx_W24 and opx_W24 sum to 100 at any order state") {
    val cpx = frame(
      Seq("SiO2", "Al2O3", "Cr2O3", "TiO2", "FeO", "MgO", "CaO", "Na2O", "K2O"),
      Seq(Seq(50.0, 5.0, 0.3, 0.5, 8.0, 12.0, 20.0, 3.0, 0.1)))
    val e = row0(Igneous.TcClinopyroxeneW24.endMembers(cpx, validate = true))
    assert(e.size == 10)
    assert(math.abs(e.values.sum - 100.0) < 0.01, s"sum=${e.values.sum}")
    val eo = row0(Igneous.TcClinopyroxeneW24.endMembers(cpx,
      orderParameters = Map("Q" -> Left(0.1)), validate = true))
    assert(math.abs(eo.values.sum - 100.0) < 0.01)
    assert(math.abs(eo("cen") - e("cen")) > 1e-9)
    val opx = frame(
      Seq("SiO2", "Al2O3", "Cr2O3", "TiO2", "FeO", "MgO", "CaO", "Na2O"),
      Seq(Seq(52.0, 4.0, 0.3, 0.3, 18.0, 24.0, 1.2, 0.2)))
    val o = row0(Igneous.TcOrthopyroxeneW24.endMembers(opx, validate = true))
    assert(o.size == 9)
    assert(math.abs(o.values.sum - 100.0) < 0.01, s"sum=${o.values.sum}")
    assert(o("en") > o("fs"))
  }

  test("igneous spl_T21 (Q1,Q2,Q3) and ol_H18 (Q) sum to 100") {
    val sp = frame(Seq("Al2O3", "Cr2O3", "TiO2", "FeO", "MgO"),
      Seq(Seq(50.0, 8.0, 1.0, 22.0, 16.0)))
    val e = row0(Igneous.TcSpinelT21.endMembers(sp, validate = true))
    assert(e.size == 8)
    assert(math.abs(e.values.sum - 100.0) < 0.01, s"sum=${e.values.sum}")
    val eo = row0(Igneous.TcSpinelT21.endMembers(sp,
      orderParameters = Map("Q1" -> Left(0.5), "Q2" -> Left(0.2), "Q3" -> Left(-0.1)),
      validate = true))
    assert(math.abs(eo.values.sum - 100.0) < 0.01)
    assert(math.abs(eo("nsp") - e("nsp")) > 1e-9)
    val ol = frame(Seq("SiO2", "FeO", "MgO", "CaO"),
      Seq(Seq(40.0, 12.0, 47.0, 1.0)))
    val o = row0(Igneous.TcOlivineH18.endMembers(ol, validate = true))
    assert(math.abs(o.values.sum - 100.0) < 0.01)
    assert(o("fo") > o("fa"))
    // pure-cfm override state still sums to 1 (olivine.py:17-24)
    val oq = row0(Igneous.TcOlivineH18.endMembers(ol,
      orderParameters = Map("Q" -> Left(0.1)), validate = true))
    assert(math.abs(oq("cfm") - 20.0) < 1.0) // cfm ~ 2Q - c*x
  }

  test("igneous bi_G25/cd_G25/ilm_W24 complete the set (8 phases)") {
    assert(Igneous.phases.length == 8)
    val bi = row0(Igneous.TcBiotiteG25.endMembers(biotiteDf, validate = true))
    assert(bi.contains("est")) // axfile's own relabel of east
    assert(math.abs(bi.values.sum - 100.0) < 0.01)
    val biP = row0(Metapelite.TcBiotite.endMembers(biotiteDf))
    // Mn-free core: phl differs from metapelite's only through the m terms
    assert(bi("phl") != biP("phl"))
    val cd = frame(Seq("SiO2", "Al2O3", "FeO", "MgO"),
      Seq(Seq(48.5, 33.0, 8.0, 8.5)))
    val e3 = row0(Igneous.TcCordieriteG25.endMembers(cd,
      orderParameters = Map("h" -> Left(0.5)), validate = true))
    assert(math.abs(e3.values.sum - 100.0) < 0.01)
    assert(math.abs(e3("hcrd") - 50.0) < 1e-6)
    val ilm = frame(Seq("TiO2", "FeO", "MgO"), Seq(Seq(50.0, 45.0, 2.0)))
    val i0 = row0(Igneous.TcIlmeniteW24.endMembers(ilm,
      orderParameters = Map("Q" -> Left(0.6), "Qt" -> Left(0.6)),
      validate = true))
    assert(math.abs(i0.values.sum - 100.0) < 0.01)
    assert(i0("ogk") >= 0 || i0("dgk") >= 0)
  }

  test("Hpxeos registry: all 39 phase objects, unique per set, igneous reuse") {
    assert(Hpxeos.all.length == 39) // 19 metapelite + 12 metabasite + 8 igneous
    assert(Hpxeos.bySet.size == 39) // no (set, abbreviation) collisions
    assert(Hpxeos.igneousFull.length == 12) // 8 own + ep/mu/pl4tr/hb reused
    assert(Hpxeos("metapelite", "g") eq Metapelite.TcGarnet)
    assert(Hpxeos("metabasite", "g") eq Metabasite.TcGarnet)
    assert(Hpxeos("igneous", "g_W24") eq Igneous.TcGarnetW24)
    intercept[NoSuchElementException](Hpxeos("igneous", "nope"))
  }

  test("scalacheck-style invariant: random admissible variables give sum=1") {
    // py+alm+spss+gr+kho is an algebraic identity in (x,z,m,f); check it
    // over a deterministic grid of admissible variable values.
    val grid = for {
      x <- Seq(0.1, 0.5, 0.9); z <- Seq(0.0, 0.3); m <- Seq(0.0, 0.2)
      f <- Seq(0.0, 0.4)
    } yield Seq(x, z, m, f)
    val vars = frame(Seq("x", "z", "m", "f"), grid)
    val polys = Poly.compileAll(Metapelite.TcGarnet.pBlock,
      org.apache.spark.sql.functions.col)
    val sums = vars.select(polys.map(_._2).reduce(_ + _).as("s"))
      .collect().map(_.getDouble(0))
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-12, s"sum=$s"))
  }
}
