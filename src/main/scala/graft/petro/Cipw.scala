package graft.petro

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.chem.Chem

/** CIPW normative mineralogy (reference: src/petropandas/_calc.py:1052-1993;
  * the algorithm itself is the published GCDkit CIPW/CIPWhb norm).
  *
  * Three variants:
  *  - [[cipwNormSimple]] (C1): branch-free vectorized cascade -> pure
  *    Column arithmetic, whole-stage codegen'd, oracle-verifiable.
  *  - [[cipwNorm]] (C2) / [[cipwNormHb]] (C3): deeply data-dependent
  *    per-row allocation with early-exit stages -> a pure Scala row
  *    function under `Dataset.map` (compiled JVM code; parallelizes
  *    per-partition with no shuffle, so it scales linearly).
  */
object Cipw {

  val CIPW_INPUTS: Seq[String] = Seq("SiO2", "TiO2", "Al2O3", "Fe2O3", "FeO",
    "MnO", "MgO", "CaO", "Na2O", "K2O", "H2O", "CO2", "P2O5", "F", "S")

  val CIPW_RESULT_NAMES: Seq[String] = Seq(
    "Q", "C", "Or", "Ab", "An", "Lc", "Ne", "Kp", "Nc", "Ac", "Ns", "Ks",
    "Di", "MgDi", "FeDi", "Wo", "Hy", "En", "Fs", "Ol", "Fo", "Fa", "Dcs",
    "Mt", "Il", "Hm", "Tn", "Pf", "Ru", "Ap", "Fr", "Py", "Cc", "Sp",
    "MgSp", "FeSp", "Total")

  val CIPWHB_RESULT_NAMES: Seq[String] = Seq(
    "Q", "C", "Or", "Ab", "An", "Lc", "Ne", "Kp", "Nc", "Ac", "Ns", "Ks",
    "Di", "MgDi", "FeDi", "Wo", "Hy", "En", "Fs", "Ol", "Fo", "Fa", "Dcs",
    "Mt", "Il", "Hm", "Tn", "Pf", "Ru", "Ap", "Fr", "Py", "Cc", "Sp",
    "MgSp", "FeSp", "Bi", "MgBi", "FeBi", "Hbl", "Act", "MgAct", "FeAct",
    "Ed", "MgEd", "FeEd", "Ri", "Total")

  /** Normative-mineral weights composed from oxide MWs
    * (reference: _calc.py:1104-1161). Composites carry weight 1. */
  val normMw: Map[String, Double] = {
    def mw(s: String) = Chem.mw(s)
    Map(
      "Q" -> mw("SiO2"), "C" -> mw("Al2O3"),
      "Or" -> (mw("K2O") + mw("Al2O3") + 6 * mw("SiO2")),
      "Ab" -> (mw("Na2O") + mw("Al2O3") + 6 * mw("SiO2")),
      "An" -> (mw("CaO") + mw("Al2O3") + 2 * mw("SiO2")),
      "Lc" -> (mw("K2O") + mw("Al2O3") + 4 * mw("SiO2")),
      "Ne" -> (mw("Na2O") + mw("Al2O3") + 4 * mw("SiO2")),
      "Kp" -> (mw("K2O") + mw("Al2O3") + 2 * mw("SiO2")),
      "Nc" -> (mw("Na2O") + mw("CO2")),
      "Ac" -> (mw("Na2O") + mw("Fe2O3") + 4 * mw("SiO2")),
      "Ns" -> (mw("Na2O") + mw("SiO2")), "Ks" -> (mw("K2O") + mw("SiO2")),
      "Di" -> 1.0,
      "MgDi" -> (mw("CaO") + mw("MgO") + 2 * mw("SiO2")),
      "FeDi" -> (mw("CaO") + mw("FeO") + 2 * mw("SiO2")),
      "Wo" -> (mw("CaO") + mw("SiO2")),
      "Hy" -> 1.0,
      "En" -> (mw("MgO") + mw("SiO2")), "Fs" -> (mw("FeO") + mw("SiO2")),
      "Ol" -> 1.0,
      "Fo" -> (2 * mw("MgO") + mw("SiO2")), "Fa" -> (2 * mw("FeO") + mw("SiO2")),
      "Dcs" -> (mw("CaO") + 2 * mw("SiO2")),
      "Mt" -> (mw("FeO") + mw("Fe2O3")), "Il" -> (mw("FeO") + mw("TiO2")),
      "Hm" -> mw("Fe2O3"),
      "Tn" -> (mw("CaO") + mw("TiO2") + mw("SiO2")),
      "Pf" -> mw("TiO2"), "Ru" -> mw("TiO2"),
      "Ap" -> (2.0 / 3 * mw("Ca5(PO4)3F")), "Fr" -> mw("CaF2"),
      "Py" -> mw("FeS2"), "Cc" -> (mw("CaO") + mw("CO2")),
      "Sp" -> 1.0,
      "MgSp" -> (mw("MgO") + mw("Al2O3")), "FeSp" -> (mw("FeO") + mw("Al2O3")),
      "Bi" -> 1.0,
      "MgBi" -> (mw("K2O") + 6 * mw("MgO") + mw("Al2O3") + 6 * mw("SiO2")),
      "FeBi" -> (mw("K2O") + 6 * mw("FeO") + mw("Al2O3") + 6 * mw("SiO2")),
      "Hbl" -> 1.0, "Act" -> 1.0,
      "MgAct" -> (2 * mw("CaO") + 5 * mw("MgO") + 8 * mw("SiO2")),
      "FeAct" -> (2 * mw("CaO") + 5 * mw("FeO") + 8 * mw("SiO2")),
      "Ed" -> 1.0,
      "MgEd" -> (4 * mw("CaO") + 10 * mw("MgO") + mw("Na2O") + mw("Al2O3") + 14 * mw("SiO2")),
      "FeEd" -> (4 * mw("CaO") + 10 * mw("FeO") + mw("Na2O") + mw("Al2O3") + 14 * mw("SiO2")),
      "Ri" -> (mw("Na2O") + mw("Fe2O3") + 3 * mw("FeO") + 8 * mw("SiO2")))
  }

  // ---- C2/C3 row functions (pure Scala, run under Dataset.map) -------------

  /** Array-backed named-value store: the row functions address values by
    * mineral name (faithful to the algorithm's published form) but the
    * per-row storage is a flat Double array — name->slot resolution is a
    * shared immutable HashMap built once per variant, so the hot loop
    * does no per-row map allocation. */
  private final class Y(idx: java.util.HashMap[String, Integer]) {
    val arr = new Array[Double](idx.size)
    def apply(n: String): Double = arr(idx.get(n).intValue)
    def update(n: String, v: Double): Unit = arr(idx.get(n).intValue) = v
  }
  private def buildIdx(names: Seq[String]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    (names ++ Seq("mgr", "fer", "femg")).zipWithIndex.foreach {
      case (n, i) => m.put(n, i)
    }
    m
  }
  private val cipwIdx = buildIdx(CIPW_RESULT_NAMES.dropRight(1))
  private val cipwHbIdx = buildIdx(CIPWHB_RESULT_NAMES.dropRight(1))
  private val cipwMwArr: Array[Double] =
    CIPW_RESULT_NAMES.dropRight(1).map(normMw).toArray
  private val cipwHbMwArr: Array[Double] =
    CIPWHB_RESULT_NAMES.dropRight(1).map(normMw).toArray

  /** ox layout follows CIPW_INPUTS order. */
  private val iSiO2 = CIPW_INPUTS.indexOf("SiO2")
  private val iTiO2 = CIPW_INPUTS.indexOf("TiO2")
  private val iAl2O3 = CIPW_INPUTS.indexOf("Al2O3")
  private val iFe2O3 = CIPW_INPUTS.indexOf("Fe2O3")
  private val iFeO = CIPW_INPUTS.indexOf("FeO")
  private val iMnO = CIPW_INPUTS.indexOf("MnO")
  private val iMgO = CIPW_INPUTS.indexOf("MgO")
  private val iCaO = CIPW_INPUTS.indexOf("CaO")
  private val iNa2O = CIPW_INPUTS.indexOf("Na2O")
  private val iK2O = CIPW_INPUTS.indexOf("K2O")
  private val iCO2 = CIPW_INPUTS.indexOf("CO2")
  private val iP2O5 = CIPW_INPUTS.indexOf("P2O5")
  private val iF = CIPW_INPUTS.indexOf("F")
  private val iS = CIPW_INPUTS.indexOf("S")

  /** Shared allocation prefix (reference: _cipw_common_allocations,
    * _calc.py:1195-1316). Returns remaining (si,ti,al,fe3,fe2,mg,ca,na). */
  private def commonAllocations(ox: Array[Double],
      idx: java.util.HashMap[String, Integer],
      cancrinite: Boolean): (Y, Array[Double]) = {
    var si = ox(iSiO2); var ti = ox(iTiO2); var al = ox(iAl2O3)
    val fe3 = ox(iFe2O3); var fe2 = ox(iFeO) + ox(iMnO)
    val mg = ox(iMgO); var ca = ox(iCaO); var na = ox(iNa2O)
    var k = ox(iK2O); var co2 = ox(iCO2); var p = ox(iP2O5)
    var fl = ox(iF); var s = ox(iS)

    val y = new Y(idx)

    if (ca >= 10.0 / 3 * p) { y("Ap") = p; ca = ca - y("Ap") * 10 / 3 }
    else { y("Ap") = 3.0 / 10 * ca; p = p - y("Ap"); ca = 0 }

    if (fl >= 2.0 / 3 * y("Ap") && !fl.isNaN) fl = fl - 2.0 / 3 * y("Ap")
    else fl = 0

    if (ca >= 0.5 * fl) { y("Fr") = 0.5 * fl; ca = ca - y("Fr") }
    else { y("Fr") = ca; fl = fl - 2 * y("Fr"); ca = 0 }

    if (!s.isNaN) {
      if (fe2 >= 0.5 * s) { y("Py") = 0.5 * s; fe2 = fe2 - y("Py") }
      else { y("Py") = fe2; s = s - 2 * y("Py"); fe2 = 0 }
    }

    if (cancrinite) { y("Nc") = co2; na = na - y("Nc") }

    if (!co2.isNaN) {
      if (ca >= co2) { y("Cc") = co2; ca = ca - y("Cc"); co2 = 0 }
      else { y("Cc") = ca; co2 = co2 - y("Cc"); ca = 0 }
    }

    if (fe2 >= ti) { y("Il") = ti; fe2 = fe2 - y("Il"); ti = 0 }
    else { y("Il") = fe2; ti = ti - y("Il"); fe2 = 0 }

    if (al >= k) { y("Or") = k; al = al - y("Or"); si = si - 6 * y("Or"); k = 0 }
    else {
      y("Or") = al; k = k - y("Or"); si = si - 6 * y("Or"); al = 0
      y("Ks") = k; si = si - y("Ks"); k = 0
    }

    if (al >= na) { y("Ab") = na; al = al - y("Ab"); si = si - 6 * y("Ab"); na = 0 }
    else { y("Ab") = al; na = na - y("Ab"); si = si - 6 * y("Ab"); al = 0 }

    (y, Array(si, ti, al, fe3, fe2, mg, ca, na))
  }

  private val cipwExcluded: Array[Boolean] = {
    val ex = Set("MgDi", "FeDi", "En", "Fs", "Fo", "Fa", "MgSp", "FeSp")
    CIPW_RESULT_NAMES.dropRight(1).map(ex.contains).toArray
  }
  private val cipwHbExcluded: Array[Boolean] = {
    val ex = Set("Di", "Hy", "Ol", "Sp", "Bi", "Hbl", "Act", "Ed")
    CIPWHB_RESULT_NAMES.dropRight(1).map(ex.contains).toArray
  }

  /** Finalize standard CIPW (reference: _cipw_final, _calc.py:1167-1192). */
  private def cipwFinal(y: Y, normsum: Boolean): Array[Double] = {
    y("En") = y("mgr") * y("Hy"); y("Fs") = y("fer") * y("Hy")
    y("Fo") = y("mgr") * y("Ol"); y("Fa") = y("fer") * y("Ol")
    y("MgDi") = y("mgr") * y("Di"); y("FeDi") = y("fer") * y("Di")
    val n = CIPW_RESULT_NAMES.length - 1
    val w = new Array[Double](n)
    var i = 0
    while (i < n) { w(i) = y.arr(i) * cipwMwArr(i); i += 1 }
    def wi(nm: String): Int = cipwIdx.get(nm).intValue
    w(wi("Di")) = w(wi("MgDi")) + w(wi("FeDi"))
    w(wi("Hy")) = w(wi("En")) + w(wi("Fs"))
    w(wi("Ol")) = w(wi("Fo")) + w(wi("Fa"))
    w(wi("Sp")) = w(wi("MgSp")) + w(wi("FeSp"))
    var total = 0.0
    i = 0; while (i < n) { if (!cipwExcluded(i)) total += w(i); i += 1 }
    if (normsum) {
      i = 0; while (i < n) { w(i) = w(i) * 100 / total; i += 1 }
      total = 0.0
      i = 0; while (i < n) { if (!cipwExcluded(i)) total += w(i); i += 1 }
    }
    val out = new Array[Double](n + 1)
    System.arraycopy(w, 0, out, 0, n); out(n) = total
    out
  }

  /** One row of the standard CIPW norm
    * (reference: _cipw_norm_row, _calc.py:1319-1473). */
  def cipwRow(ox: Array[Double], normsum: Boolean, cancrinite: Boolean,
      spinel: Boolean): Array[Double] = {
    val (y, r) = commonAllocations(ox, cipwIdx, cancrinite)
    var si = r(0); var ti = r(1); var al = r(2); var fe3 = r(3)
    var fe2 = r(4); val mg = r(5); var ca = r(6); var na = r(7)

    if (na >= fe3) {
      y("Ac") = fe3; na = na - y("Ac"); fe3 = 0
      y("Ns") = na; si = si - 4 * y("Ac") - y("Ns")
    } else { y("Ac") = na; fe3 = fe3 - y("Ac"); na = 0; si = si - 4 * y("Ac") }

    if (al >= ca) {
      y("An") = ca; al = al - y("An"); ca = 0; si = si - 2 * y("An")
      y("C") = al; al = 0
    } else { y("An") = al; ca = ca - y("An"); si = si - 2 * y("An"); al = 0 }

    if (ca >= ti) { y("Tn") = ti; ca = ca - y("Tn"); si = si - y("Tn"); ti = 0 }
    else {
      y("Tn") = ca; ti = ti - y("Tn"); ca = 0
      y("Ru") = ti; si = si - y("Tn"); ti = 0
    }

    if (fe3 >= fe2) { y("Mt") = fe2; fe3 = fe3 - y("Mt"); fe2 = 0; y("Hm") = fe3; fe3 = 0 }
    else { y("Mt") = fe3; fe2 = fe2 - y("Mt"); fe3 = 0 }

    if (fe2 + mg == 0.0)
      throw new ArithmeticException("fe2+mg == 0") // reference ZeroDivisionError -> NaN row
    y("fer") = fe2 / (fe2 + mg); y("mgr") = mg / (fe2 + mg); y("femg") = fe2 + mg

    if (spinel && si < 45) {
      if (y("femg") <= y("C")) {
        y("MgSp") = y("mgr") * y("femg"); y("FeSp") = y("fer") * y("femg")
        y("C") = y("C") - y("MgSp") - y("FeSp")
        y("MgSp") = y("mgr") * y("C"); y("FeSp") = y("fer") * y("C")
        y("C") = 0; y("femg") = y("femg") - y("MgSp") - y("FeSp")
      }
    }

    if (ca >= y("femg")) {
      y("Di") = y("femg"); ca = ca - y("femg"); y("Wo") = ca
      si = si - 2 * y("Di") - y("Wo"); ca = 0
    } else {
      y("Di") = ca; y("femg") = y("femg") - ca; y("Hy") = y("femg")
      si = si - 2 * y("Di") - y("Hy")
    }

    if (si >= 0) { y("Q") = si; return cipwFinal(y, normsum) }
    y("Q") = 0
    var d = math.abs(si)

    if (d <= y("Hy") / 2) { y("Ol") = d; y("Hy") = y("Hy") - 2 * d; return cipwFinal(y, normsum) }
    y("Ol") = y("Hy") / 2; d = d - y("Hy") / 2; y("Hy") = 0

    if (d <= y("Tn")) { y("Tn") = y("Tn") - d; y("Pf") = d; return cipwFinal(y, normsum) }
    y("Pf") = y("Tn"); d = d - y("Tn"); y("Tn") = 0

    if (d <= 4 * y("Ab")) { y("Ne") = d / 4; y("Ab") = y("Ab") - d / 4; return cipwFinal(y, normsum) }
    y("Ne") = y("Ab"); d = d - 4 * y("Ab"); y("Ab") = 0

    if (d <= 2 * y("Or")) { y("Lc") = d / 2; y("Or") = y("Or") - d / 2; return cipwFinal(y, normsum) }
    y("Lc") = y("Or"); d = d - 2 * y("Or"); y("Or") = 0

    if (d < y("Wo") / 2) { y("Dcs") = d; y("Wo") = y("Wo") - 2 * d; return cipwFinal(y, normsum) }
    y("Dcs") = y("Wo") / 2; d = d - y("Wo") / 2; y("Wo") = 0

    if (d <= y("Di")) {
      y("Dcs") = y("Dcs") + d / 2; y("Ol") = y("Ol") + d / 2
      y("Di") = y("Di") - d; y("Kp") = 0
      return cipwFinal(y, normsum)
    }
    y("Dcs") = y("Dcs") + y("Di") / 2; y("Ol") = y("Ol") + y("Di") / 2
    d = d - y("Di"); y("Di") = 0

    y("Kp") = d / 2; y("Lc") = y("Lc") - d / 2
    cipwFinal(y, normsum)
  }

  /** Finalize CIPWhb (reference: _cipwhb_final, _calc.py:1479-1513). */
  private def cipwHbFinal(y: Y, normsum: Boolean): Array[Double] = {
    y("En") = y("mgr") * y("Hy"); y("Fs") = y("fer") * y("Hy")
    y("Fo") = y("mgr") * y("Ol"); y("Fa") = y("fer") * y("Ol")
    y("MgDi") = y("mgr") * y("Di"); y("FeDi") = y("fer") * y("Di")
    val n = CIPWHB_RESULT_NAMES.length - 1
    val w = new Array[Double](n)
    var i = 0
    while (i < n) { w(i) = y.arr(i) * cipwHbMwArr(i); i += 1 }
    def wi(nm: String): Int = cipwHbIdx.get(nm).intValue
    w(wi("Di")) = w(wi("MgDi")) + w(wi("FeDi"))
    w(wi("Hy")) = w(wi("En")) + w(wi("Fs"))
    w(wi("Ol")) = w(wi("Fo")) + w(wi("Fa"))
    w(wi("Sp")) = w(wi("MgSp")) + w(wi("FeSp"))
    w(wi("Bi")) = w(wi("MgBi")) + w(wi("FeBi"))
    w(wi("Act")) = w(wi("MgAct")) + w(wi("FeAct"))
    w(wi("Ed")) = w(wi("MgEd")) + w(wi("FeEd"))
    w(wi("Hbl")) = w(wi("Act")) + w(wi("Ed")) + w(wi("Ri"))
    var total = 0.0
    i = 0; while (i < n) { if (!cipwHbExcluded(i)) total += w(i); i += 1 }
    if (normsum) {
      i = 0; while (i < n) { w(i) = w(i) * 100 / total; i += 1 }
      total = 0.0
      i = 0; while (i < n) { if (!cipwHbExcluded(i)) total += w(i); i += 1 }
    }
    val out = new Array[Double](n + 1)
    System.arraycopy(w, 0, out, 0, n); out(n) = total
    out
  }

  /** One row of the CIPWhb norm (hornblende/biotite recasting;
    * reference: _cipwhb_norm_row, _calc.py:1516-1735). */
  def cipwHbRow(ox: Array[Double], normsum: Boolean, cancrinite: Boolean,
      spinel: Boolean): Array[Double] = {
    val (y, r) = commonAllocations(ox, cipwHbIdx, cancrinite)
    var si = r(0); var al = r(2); var fe3 = r(3)
    var fe2 = r(4); val mg = r(5); var ca = r(6); var na = r(7)

    // Riebeckite
    if (fe3 <= fe2 / 3) {
      if (na <= fe3) {
        y("Ri") = na; fe3 = fe3 - y("Ri"); fe2 = fe2 - 3 * y("Ri")
        si = si - 8 * y("Ri"); na = 0
      } else {
        y("Ri") = fe3; na = na - y("Ri"); fe2 = fe2 - 3 * y("Ri")
        si = si - 8 * y("Ri"); fe3 = 0
      }
    } else {
      if (na <= fe2 / 3) {
        y("Ri") = na; fe3 = fe3 - y("Ri"); fe2 = fe2 - 3 * y("Ri")
        si = si - 8 * y("Ri"); na = 0
      } else {
        y("Ri") = fe2 / 3; na = na - y("Ri"); fe3 = fe3 - y("Ri")
        si = si - 8 * y("Ri"); fe2 = 0
      }
    }

    y("Ns") = na; si = si - y("Ns")

    if (fe3 >= fe2) { y("Mt") = fe2; fe3 = fe3 - y("Mt"); fe2 = 0; y("Hm") = fe3; fe3 = 0 }
    else { y("Mt") = fe3; fe2 = fe2 - y("Mt"); fe3 = 0 }

    if (fe2 + mg == 0.0) throw new ArithmeticException("fe2+mg == 0")
    y("fer") = fe2 / (fe2 + mg); y("mgr") = mg / (fe2 + mg); y("femg") = fe2 + mg

    if (spinel && si < 45) {
      if (y("femg") <= y("C")) {
        y("MgSp") = y("mgr") * y("femg"); y("FeSp") = y("fer") * y("femg")
        y("C") = y("C") - y("MgSp") - y("FeSp")
        y("MgSp") = y("mgr") * y("C"); y("FeSp") = y("fer") * y("C")
        y("C") = 0; y("femg") = y("femg") - y("MgSp") - y("FeSp")
      }
    }

    if (al >= ca) {
      y("An") = ca; al = al - y("An"); ca = 0; si = si - 2 * y("An")
      y("C") = al; al = 0
    } else { y("An") = al; ca = ca - y("An"); si = si - 2 * y("An"); al = 0 }

    // Biotite
    if (y("femg") <= 6 * y("Or")) {
      y("MgBi") = 1.0 / 6 * y("mgr") * y("femg")
      y("FeBi") = 1.0 / 6 * y("fer") * y("femg")
      y("Or") = y("Or") - y("MgBi") - y("FeBi"); y("femg") = 0
    } else {
      y("MgBi") = y("mgr") * y("Or"); y("FeBi") = y("fer") * y("Or")
      y("femg") = y("femg") - 6 * (y("FeBi") + y("MgBi")); y("Or") = 0
    }

    // Actinolite
    if (y("femg") <= 5.0 / 2 * ca) {
      y("MgAct") = 1.0 / 5 * y("mgr") * y("femg")
      y("FeAct") = 1.0 / 5 * y("fer") * y("femg")
      ca = ca - 2 * (y("MgAct") + y("FeAct")); y("femg") = 0
      y("Wo") = ca; si = si - 8 * (y("FeAct") + y("MgAct")) - y("Wo"); ca = 0
    } else {
      y("MgAct") = 0.5 * y("mgr") * ca; y("FeAct") = 0.5 * y("fer") * ca
      y("femg") = y("femg") - 5 * (y("FeAct") + y("MgAct")); ca = 0
      y("En") = y("mgr") * y("femg"); y("Fs") = y("fer") * y("femg")
      si = si - 8 * (y("MgAct") + y("FeAct")) - y("En") - y("Fs")
    }

    if (si >= 0) { y("Q") = si; return cipwHbFinal(y, normsum) }
    y("Q") = 0
    var d = math.abs(si)

    // Edenite from actinolite + albite
    if (y("MgAct") + y("FeAct") >= 2 * y("Ab")) {
      if (y("Ab") >= d / 8) {
        y("MgEd") = y("mgr") * d / 8; y("FeEd") = y("fer") * d / 8
        y("MgAct") = y("MgAct") - 2 * y("MgEd"); y("FeAct") = y("FeAct") - 2 * y("FeEd")
        y("Ab") = y("Ab") - (y("MgEd") + y("FeEd"))
        return cipwHbFinal(y, normsum)
      } else {
        y("MgEd") = y("mgr") * y("Ab"); y("FeEd") = y("fer") * y("Ab")
        y("MgAct") = y("MgAct") - 2 * y("MgEd"); y("FeAct") = y("FeAct") - 2 * y("FeEd")
        d = d - 8 * (y("MgEd") + y("FeEd")); y("Ab") = 0
      }
    } else {
      if (y("MgAct") + y("FeAct") >= d / 4) {
        y("MgEd") = y("mgr") * d / 8; y("FeEd") = y("fer") * d / 8
        y("MgAct") = y("MgAct") - 2 * y("MgEd"); y("FeAct") = y("FeAct") - 2 * y("FeEd")
        y("Ab") = y("Ab") - (y("MgEd") + y("FeEd"))
        return cipwHbFinal(y, normsum)
      } else {
        y("MgEd") = 0.5 * y("MgAct"); y("FeEd") = 0.5 * y("FeAct")
        y("Ab") = y("Ab") - (y("MgEd") + y("FeEd"))
        d = d - 8 * (y("MgEd") + y("FeEd"))
        y("MgAct") = 0; y("FeAct") = 0
      }
    }

    if (d <= 0.5 * (y("En") + y("Fs"))) {
      y("Fo") = y("mgr") * d; y("Fa") = y("fer") * d
      y("En") = y("En") - 2 * y("Fo"); y("Fs") = y("Fs") - 2 * y("Fa")
      return cipwHbFinal(y, normsum)
    }
    y("Fo") = 0.5 * y("En"); y("Fa") = 0.5 * y("Fs")
    d = d - 0.5 * (y("En") + y("Fs")); y("En") = 0; y("Fs") = 0

    if (y("Fo") + y("Fa") <= 0.5 * y("C")) {
      if (y("Fo") + y("Fa") >= d) {
        y("MgSp") = y("MgSp") + 2 * y("mgr") * d; y("FeSp") = y("FeSp") + 2 * y("fer") * d
        y("C") = y("C") - 2 * d
        y("Fo") = y("Fo") - y("mgr") * d; y("Fa") = y("Fa") - y("fer") * d
        return cipwHbFinal(y, normsum)
      } else {
        y("MgSp") = y("MgSp") + 2 * y("Fo"); y("FeSp") = y("FeSp") + 2 * y("Fa")
        y("C") = y("C") - 2 * (y("Fo") + y("Fa"))
        d = d - (y("Fo") + y("Fa")); y("Fo") = 0; y("Fa") = 0
      }
    } else {
      if (y("C") >= 2 * d) {
        y("MgSp") = y("MgSp") + 2 * y("mgr") * d; y("FeSp") = y("FeSp") + 2 * y("fer") * d
        y("C") = y("C") - 2 * d
        y("Fo") = y("Fo") - y("mgr") * d; y("Fa") = y("Fa") - y("fer") * d
        return cipwHbFinal(y, normsum)
      } else {
        y("MgSp") = y("MgSp") + 2 * y("mgr") * y("C"); y("FeSp") = y("FeSp") + 2 * y("fer") * y("C")
        d = d - 0.5 * y("C")
        y("Fo") = y("Fo") - 0.5 * y("mgr") * y("C"); y("Fa") = y("Fa") - 0.5 * y("fer") * y("C")
        y("C") = 0
      }
    }

    if (d <= 4 * y("Ab")) { y("Ne") = d / 4; y("Ab") = y("Ab") - d / 4; return cipwHbFinal(y, normsum) }
    y("Ne") = y("Ab"); d = d - 4 * y("Ab"); y("Ab") = 0
    cipwHbFinal(y, normsum)
  }

  // ---- runner --------------------------------------------------------------

  val CIPW_DROP_COLUMNS: Seq[String] = Seq("En", "Fs", "Fo", "Fa", "MgDi", "FeDi")
  val CIPWHB_DROP_COLUMNS: Seq[String] = CIPW_DROP_COLUMNS ++
    Seq("MgBi", "FeBi", "Act", "FeAct", "MgAct", "Ed", "FeEd", "MgEd")

  private def runNorm(df: DataFrame, carry: Seq[String], names: Seq[String],
      dropCols: Seq[String],
      rowFn: (Array[Double], Boolean, Boolean, Boolean) => Array[Double],
      normsum: Boolean, cancrinite: Boolean, spinel: Boolean,
      completeResults: Boolean): DataFrame = {
    // wt% -> molar proportions; missing CIPW inputs -> 0
    val moleExprs = CIPW_INPUTS.map { c =>
      if (df.columns.contains(c)) (col(c) / lit(Chem.mw(c))).as(c) else lit(0.0).as(c)
    }
    val input = df.select(carry.map(col) ++ moleExprs: _*)
    val inSchema = input.schema
    val outSchema = StructType(
      carry.map(c => inSchema(c)) ++ names.map(n => StructField(n, DoubleType)))
    val nCarry = carry.length
    val nIn = CIPW_INPUTS.length
    val result = input.map { row =>
      val ox = new Array[Double](nIn)
      var i = 0
      while (i < nIn) {
        ox(i) = if (row.isNullAt(nCarry + i)) 0.0 else row.getDouble(nCarry + i)
        i += 1
      }
      val out =
        try rowFn(ox, normsum, cancrinite, spinel)
        catch { case _: Exception => Array.fill(names.length)(Double.NaN) }
      Row.fromSeq((0 until nCarry).map(row.get) ++ out)
    }(Encoders.row(outSchema))
    if (completeResults) result
    else {
      val kept = result.drop(dropCols: _*)
      // G5 zero-column pruning: one aggregate pass decides the projection
      val valCols = kept.columns.filterNot(carry.contains)
      val nonZero = kept.agg(
        max(abs(col(valCols.head))).as(valCols.head),
        valCols.tail.map(c => max(abs(col(c))).as(c)): _*).collect()(0)
      val keepCols = valCols.zipWithIndex.collect {
        case (c, i) if !nonZero.isNullAt(i) && nonZero.getDouble(i) != 0.0 => c
      }
      kept.select((carry ++ keepCols).map(col): _*)
        .filter(!isnan(col("Total")))
    }
  }

  /** C2: standard GCDkit-faithful CIPW norm. */
  def cipwNorm(df: DataFrame, carry: Seq[String] = Nil, normsum: Boolean = false,
      cancrinite: Boolean = false, spinel: Boolean = false,
      completeResults: Boolean = false): DataFrame =
    runNorm(df, carry, CIPW_RESULT_NAMES, CIPW_DROP_COLUMNS, cipwRow,
      normsum, cancrinite, spinel, completeResults)

  /** C3: CIPW norm with hornblende/biotite recasting. */
  def cipwNormHb(df: DataFrame, carry: Seq[String] = Nil, normsum: Boolean = false,
      cancrinite: Boolean = false, spinel: Boolean = false,
      completeResults: Boolean = false): DataFrame =
    runNorm(df, carry, CIPWHB_RESULT_NAMES, CIPWHB_DROP_COLUMNS, cipwHbRow,
      normsum, cancrinite, spinel, completeResults)

  // ---- C1: simple vectorized norm as a Column cascade ----------------------

  /** Simple CIPW norm (reference: cipw_norm_simple, _calc.py:1855-1993).
    * Branch-free vector arithmetic -> pure Column cascade. Column set is
    * static (zero-column pruning left to the caller / kept off for
    * deterministic schemas at scale). */
  def cipwNormSimple(df: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    def m(c: String): Column =
      if (df.columns.contains(c)) col(c) / lit(Chem.mw(c)) else lit(0.0)
    def clip0(c: Column): Column = greatest(c, lit(0.0))
    val ap = m("P2O5")
    val cao1 = m("CaO") - lit(3.0) * ap
    val il = m("TiO2")
    val feo1 = m("FeO") - il
    val mt = m("Fe2O3")
    val feo2 = feo1 - mt
    val cr = m("Cr2O3")
    val feo3 = feo2 - cr
    val orM = m("K2O")
    val al1 = m("Al2O3") - orM
    val si1 = m("SiO2") - lit(6.0) * orM
    val ab = m("Na2O")
    val al2 = al1 - ab
    val si2 = si1 - lit(6.0) * ab
    val an = least(clip0(al2), cao1)
    val al3 = al2 - an
    val si3 = si2 - lit(2.0) * an
    val cao2 = cao1 - an
    val c = clip0(al3)
    val di = least(clip0(cao2), clip0(m("MgO")))
    val cao3 = cao2 - di
    val mgo1 = m("MgO") - di
    val si4 = si3 - lit(2.0) * di
    val hyMg0 = clip0(mgo1)
    val hyFe0 = clip0(feo3)
    val hyT0 = hyMg0 + hyFe0
    val hyT = least(hyT0, clip0(si4))
    val scale = hyT / when(hyT === 0.0, 1.0).otherwise(hyT)
    val hyMg = hyMg0 * scale
    val hyFe = hyFe0 * scale
    val si5 = si4 - hyMg - hyFe
    val qz = clip0(si5)
    val _ = cao3 // cao fully allocated; kept for structural fidelity
    df.select(carry.map(col) ++ Seq(
      (ap * lit(Chem.mw("Ca3(PO4)2"))).as("Ap"),
      (il * lit(Chem.mw("FeTiO3"))).as("Il"),
      (mt * lit(Chem.mw("Fe3O4"))).as("Mt"),
      (cr * lit(Chem.mw("FeCr2O4"))).as("Crn"),
      (orM * lit(Chem.mw("K2Al2Si6O16"))).as("Or"),
      (ab * lit(Chem.mw("Na2Al2Si6O16"))).as("Ab"),
      (an * lit(Chem.mw("CaAl2Si2O8"))).as("An"),
      (c * lit(Chem.mw("Al2O3"))).as("C"),
      (di * lit(Chem.mw("CaMgSi2O6"))).as("Di"),
      (hyMg * lit(Chem.mw("MgSiO3")) + hyFe * lit(Chem.mw("FeSiO3"))).as("Hy"),
      (qz * lit(Chem.mw("SiO2"))).as("Q")): _*)
  }
}
