package graft.petro

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** PetroFrame accessor-chain parity
  * (reference: tests/test_petro.py round trips + attrs propagation). */
class PetroFrameSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def frame(cols: Seq[String], rows: Seq[Seq[Any]]): DataFrame = {
    val schema = StructType(cols.map {
      case c @ ("Mineral" | "Sample") => StructField(c, StringType)
      case c => StructField(c, DoubleType)
    })
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r: _*)), 1), schema)
  }

  lazy val garnetTable = frame(
    Seq("Mineral", "SiO2", "Al2O3", "FeO", "MnO", "MgO", "CaO"),
    Seq(
      Seq[Any]("Garnet", 36.50, 20.50, 25.00, 15.00, 1.50, 1.00),
      Seq[Any]("Augite", 52.00, 4.50, 8.50, 0.00, 15.00, 18.00)))

  def row0(df: DataFrame): Map[String, Double] = {
    val r = df.collect()(0)
    df.columns.zipWithIndex.collect {
      case (c, i) if df.schema(i).dataType == DoubleType && !r.isNullAt(i) =>
        c -> r.getDouble(i)
    }.toMap
  }

  test("select propagates unit state; cations round trip restores wt% (test_petro.py:121,204)") {
    val pf = PetroFrame.clean(garnetTable, carry = Seq("Mineral"))
    val garnets = pf.select("Garnet", on = "Mineral")
    assert(garnets.df.count() == 1)
    val apfu = garnets.cations(nOxy = Some(12.0))
    assert(apfu.units == Units.Apfu)
    val si = row0(apfu.df.drop(PetroFrame.TotalCol))("Si{4+}")
    assert(si > 2.8 && si < 3.2)
    val back = apfu.convert(Units.WtPct)
    val orig = row0(garnets.df)
    val rt = row0(back.df)
    orig.foreach { case (k, v) => assert(math.abs(rt(k) - v) < 1e-6, s"$k: ${rt(k)} vs $v") }
  }

  test("select(str) is regex like pandas .str.contains (_accessors.py:421)") {
    val pf = PetroFrame.clean(garnetTable, carry = Seq("Mineral"))
    // alternation matches both rows; a literal read of the pattern matches none
    assert(pf.select("Garnet|Augite", on = "Mineral").df.count() == 2)
    assert(pf.selectLiteral("Garnet|Augite", on = "Mineral").df.count() == 0)
    // unanchored search-anywhere semantics (re.search, not fullmatch)
    assert(pf.select("arne", on = "Mineral").df.count() == 1)
    // anchors honored
    assert(pf.select("^Aug", on = "Mineral").df.count() == 1)
    assert(pf.select("^ug", on = "Mineral").df.count() == 0)
  }

  test("moles -> wt% round trip is identity (test_petro.py oxides round trip)") {
    val pf = PetroFrame.clean(garnetTable, carry = Seq("Mineral"))
    val rt = pf.moles.oxides
    val orig = row0(pf.df)
    val got = row0(rt.df)
    orig.foreach { case (k, v) => assert(math.abs(got(k) - v) < 1e-9) }
  }

  test("cleaning applies aliases and clips negatives (test_bulk.py:33,51)") {
    val dirty = frame(Seq("FeOT", "H2O_PLUS", "SiO2"),
      Seq(Seq[Any](5.0, -1.0, 40.0)))
    val pf = PetroFrame.clean(dirty)
    assert(pf.df.columns.toSet == Set("FeO", "H2O", "SiO2"))
    assert(row0(pf.df)("H2O") == 0.0) // negative clipped
  }

  test("split_valence round trip keeps analytical total (test_petro.py TestOxidesOxidize)") {
    val pf = PetroFrame.clean(garnetTable, carry = Seq("Mineral"))
      .select("Garnet", on = "Mineral")
    val split = pf.splitValence("Fe", "droop", nOxy = 12.0, idealCations = 8.0)
    val cols = split.df.columns.toSet
    assert(cols.contains("FeO") || cols.contains("Fe2O3"))
    val origTotal = row0(pf.df).values.sum
    val newTotal = row0(split.df).values.sum
    assert(math.abs(origTotal - newTotal) < 1e-6, s"$origTotal vs $newTotal")
  }

  test("oxidize splits FeO by oxygen excess in mole space (test_petro.py:284)") {
    val pf = PetroFrame.clean(garnetTable, carry = Seq("Mineral"))
      .select("Garnet", on = "Mineral")
    val ox = pf.oxidize(oExcess = 1.0)
    val m = row0(ox.df)
    assert(m.contains("Fe2O3") && m("Fe2O3") > 0)
    val red = ox.reduced
    assert(!red.df.columns.contains("Fe2O3"))
  }

  test("accessor surface parity: every reference verb reachable from the frame") {
    import org.apache.spark.sql.functions.lit
    val pf = PetroFrame.clean(garnetTable, carry = Seq("Mineral"))
    // oxides accessor verbs
    assert(pf.apatiteCorrection.df.count() == 2)
    assert(pf.mean(None).count() == 1)
    assert(pf.mean(Some("Mineral")).count() == 2)
    // bulk accessor verbs
    val as = pf.aluminaSaturation(classify = true)
    assert(as.columns.toSeq.containsSlice(Seq("A/NK", "A/CNK", "shand")))
    assert(pf.oxideRatios.columns.contains("Mg#"))
    assert(pf.cipwSimple.columns.contains("Q"))
    assert(pf.cipw(normsum = true).columns.contains("Total"))
    assert(pf.cipwHb().columns.nonEmpty)
    assert(pf.reframe(Seq("SiO2", "Al2O3")).df.columns.toSet ==
      Set("Mineral", "SiO2", "Al2O3"))
    // mineral accessor verbs
    val grt = pf.select("Garnet", on = "Mineral")
    assert(grt.apfu(Minerals.Grt).columns.contains("Si{4+}"))
    assert(grt.siteAllocations(Minerals.Grt).columns.exists(_.startsWith("X:")))
    assert(grt.endMembers(Minerals.Grt).columns.contains("Alm"))
    assert(grt.checkStoichiometry(Minerals.Grt).columns.contains("cation_deviation"))
    // thermo sinks
    val (header, lines) = pf.tcBulk(labelCol = lit("x"))
    assert(header.startsWith("bulk") && lines.columns.contains("line"))
    assert(pf.perplexBulk().columns.contains("block"))
    assert(pf.magemin(labelCol = lit("x")).columns.contains("line"))
  }

  test("oxidizeMoles idempotence is value-aware (_calc.py:870)") {
    import org.apache.spark.sql.functions.lit
    val moles = frame(Seq("SiO2", "FeO", "Fe2O3"),
      Seq(Seq[Any](0.6, 0.3, 0.0), Seq[Any](0.5, 0.4, 0.0)))
    // an all-zero Fe2O3 column must be re-oxidized (overwritten)...
    val vcols = Seq("SiO2", "FeO", "Fe2O3")
    val ox = Convert.oxidizeMoles(moles, lit(1.0), vcols)
    val m = row0(ox)
    assert(m("Fe2O3") > 0.0, s"all-zero Fe2O3 not re-oxidized: $m")
    // ...while any positive Fe2O3 short-circuits to the input unchanged
    val already = frame(Seq("SiO2", "FeO", "Fe2O3"),
      Seq(Seq[Any](0.6, 0.3, 0.05)))
    val ox2 = Convert.oxidizeMoles(already, lit(1.0), vcols)
    assert(row0(ox2) == row0(already))
  }
}
