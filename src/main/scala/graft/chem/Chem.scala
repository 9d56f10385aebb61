package graft.chem

/** Chemistry core: element masses, formula parsing, oxide/ion utilities.
  *
  * Re-expresses the behavior of the reference's column-name-driven schema
  * (reference: src/petropandas/_core.py:40-275) as a pure-Scala, driver-side
  * classifier. All parsing happens once at plan-build time; results are
  * embedded into Catalyst plans as literals, so none of this runs per-row.
  *
  * Masses are IUPAC 2021 standard atomic weights (public data).
  */
object Chem {

  /** Standard atomic weights (g/mol). Covers every element the engine's
    * domain surface can name (EMPA oxides, trace oxides, volatiles).
    */
  val atomicMass: Map[String, Double] = Map(
    "H" -> 1.008, "He" -> 4.002602, "Li" -> 6.94, "Be" -> 9.0121831,
    "B" -> 10.81, "C" -> 12.011, "N" -> 14.007, "O" -> 15.999,
    "F" -> 18.998403163, "Ne" -> 20.1797, "Na" -> 22.98976928,
    "Mg" -> 24.305, "Al" -> 26.9815385, "Si" -> 28.085,
    "P" -> 30.973761998, "S" -> 32.06, "Cl" -> 35.45, "Ar" -> 39.948,
    "K" -> 39.0983, "Ca" -> 40.078, "Sc" -> 44.955908, "Ti" -> 47.867,
    "V" -> 50.9415, "Cr" -> 51.9961, "Mn" -> 54.938044, "Fe" -> 55.845,
    "Co" -> 58.933194, "Ni" -> 58.6934, "Cu" -> 63.546, "Zn" -> 65.38,
    "Ga" -> 69.723, "Ge" -> 72.63, "As" -> 74.921595, "Se" -> 78.971,
    "Br" -> 79.904, "Kr" -> 83.798, "Rb" -> 85.4678, "Sr" -> 87.62,
    "Y" -> 88.90584, "Zr" -> 91.224, "Nb" -> 92.90637, "Mo" -> 95.95,
    "Ru" -> 101.07, "Rh" -> 102.9055, "Pd" -> 106.42, "Ag" -> 107.8682,
    "Cd" -> 112.414, "In" -> 114.818, "Sn" -> 118.71, "Sb" -> 121.76,
    "Te" -> 127.6, "I" -> 126.90447, "Xe" -> 131.293, "Cs" -> 132.90545196,
    "Ba" -> 137.327, "La" -> 138.90547, "Ce" -> 140.116,
    "Pr" -> 140.90766, "Nd" -> 144.242, "Sm" -> 150.36, "Eu" -> 151.964,
    "Gd" -> 157.25, "Tb" -> 158.92535, "Dy" -> 162.5, "Ho" -> 164.93033,
    "Er" -> 167.259, "Tm" -> 168.93422, "Yb" -> 173.045, "Lu" -> 174.9668,
    "Hf" -> 178.49, "Ta" -> 180.94788, "W" -> 183.84, "Re" -> 186.207,
    "Os" -> 190.23, "Ir" -> 192.217, "Pt" -> 195.084, "Au" -> 196.966569,
    "Hg" -> 200.592, "Tl" -> 204.38, "Pb" -> 207.2, "Bi" -> 208.9804,
    "Th" -> 232.0377, "U" -> 238.02891
  )

  /** EMPA vendor column spellings -> standard oxide formula
    * (reference: src/petropandas/_core.py:15-32).
    */
  val aliases: Map[String, String] = Map(
    "FeO*" -> "FeO", "FeOT" -> "FeO", "FeO tot" -> "FeO", "FeOt" -> "FeO",
    "FeO Total" -> "FeO", "FeO(T)" -> "FeO",
    "Fe2O3*" -> "Fe2O3", "Fe2O3T" -> "Fe2O3", "Fe2O3 tot" -> "Fe2O3",
    "Fe2O3t" -> "Fe2O3", "Fe2O3 Total" -> "Fe2O3", "Fe2O3(T)" -> "Fe2O3",
    "H2O_PLUS" -> "H2O", "H2O+" -> "H2O", "H2OPLUS" -> "H2O", "H2OP" -> "H2O"
  )

  /** Common EMPA oxidation state per element
    * (reference: src/petropandas/_core.py:204-220); unlisted default 2.
    */
  private val elementCharge: Map[String, Int] = Map(
    "Si" -> 4, "Ti" -> 4, "Al" -> 3, "Cr" -> 3, "Fe" -> 2, "Mn" -> 2,
    "Mg" -> 2, "Ca" -> 2, "Na" -> 1, "K" -> 1, "Ba" -> 2, "Sr" -> 2,
    "Zn" -> 2, "P" -> 5, "V" -> 3
  )

  def chargeOf(element: String): Int = elementCharge.getOrElse(element, 2)

  /** A parsed chemical formula: element -> atom count, plus net charge.
    * `ionElement` is set when the formula is a single charged atom
    * (`Fe{2+}` style ion column names).
    */
  final case class Formula(
      atoms: Map[String, Double],
      charge: Int,
      ionElement: Option[String]
  ) {
    def mass: Double = atoms.map { case (el, n) => atomicMass(el) * n }.sum
    def hasOxygen: Boolean = atoms.contains("O")
    def cationsPer: Double = atoms.collect { case (el, n) if el != "O" => n }.sum
    def oxygensPer: Double = atoms.getOrElse("O", 0.0)
    /** First non-oxygen element symbol (insertion order preserved). */
    def elementOf: String = atomOrder.find(_ != "O").getOrElse("")
    /** element symbols in first-appearance order */
    var atomOrder: List[String] = atoms.keys.toList
  }

  private val ionRe = """^([A-Z][a-z]{0,2})\{(\d*)([+-])\}$""".r

  /** Parse a column name as a chemical formula; None if not parseable.
    * Grammar: (element count? | '(' formula ')' count?)+ charge?
    * where charge = `{n+}` / `{+}` / `{n-}` / `{-}` (ion columns).
    */
  def parseFormula(name: String): Option[Formula] = {
    if (name == null || name.isEmpty) return None
    // Ion spelling first: single element with {charge} suffix.
    name match {
      case ionRe(sym, digits, sign) if atomicMass.contains(sym) =>
        val mag = if (digits.isEmpty) 1 else digits.toInt
        val chg = if (sign == "+") mag else -mag
        val f = Formula(Map(sym -> 1.0), chg, Some(sym))
        f.atomOrder = List(sym)
        return Some(f)
      case _ => ()
    }
    val s = name
    val order = scala.collection.mutable.ListBuffer.empty[String]
    // Recursive descent with backtracking on 2- vs 1-letter symbols.
    def parseGroup(pos: Int, acc: Map[String, Double], mult: Double): Option[(Int, Map[String, Double])] = {
      if (pos >= s.length) return Some((pos, acc))
      val c = s.charAt(pos)
      if (c == '(') {
        parseSeq(pos + 1, Map.empty) match {
          case Some((p2, inner)) if p2 < s.length && s.charAt(p2) == ')' =>
            val (p3, n) = parseCount(p2 + 1)
            val merged = inner.foldLeft(acc) { case (m, (el, cnt)) =>
              m.updated(el, m.getOrElse(el, 0.0) + cnt * n * mult)
            }
            Some((p3, merged))
          case _ => None
        }
      } else if (c.isUpper) {
        // try 2-letter then 1-letter
        val two = if (pos + 1 < s.length && s.charAt(pos + 1).isLower) Some(s.substring(pos, pos + 2)) else None
        val candidates = two.toList.filter(atomicMass.contains) ++
          (if (atomicMass.contains(c.toString)) List(c.toString) else Nil)
        candidates.view.flatMap { sym =>
          val (p2, n) = parseCount(pos + sym.length)
          if (!order.contains(sym)) order += sym
          Some((p2, acc.updated(sym, acc.getOrElse(sym, 0.0) + n * mult)))
        }.headOption match {
          case Some((p2, m)) => parseRest(p2, m, mult)
          case None => None
        }
      } else None
    }
    def parseRest(pos: Int, acc: Map[String, Double], mult: Double): Option[(Int, Map[String, Double])] =
      if (pos >= s.length || s.charAt(pos) == ')') Some((pos, acc))
      else parseGroup(pos, acc, mult) match {
        case Some((p2, m)) if p2 != pos => Some((p2, m))
        case other => other
      }
    def parseSeq(pos: Int, acc: Map[String, Double]): Option[(Int, Map[String, Double])] = {
      var p = pos
      var m = acc
      var progressed = false
      while (p < s.length && s.charAt(p) != ')') {
        parseGroup(p, Map.empty, 1.0) match {
          case Some((p2, part)) if p2 != p =>
            part.foreach { case (el, cnt) => m = m.updated(el, m.getOrElse(el, 0.0) + cnt) }
            p = p2; progressed = true
          case _ => return if (progressed) Some((p, m)) else None
        }
      }
      Some((p, m))
    }
    def parseCount(pos: Int): (Int, Double) = {
      var p = pos
      while (p < s.length && s.charAt(p).isDigit) p += 1
      if (p == pos) (pos, 1.0) else (p, s.substring(pos, p).toDouble)
    }

    parseSeq(0, Map.empty) match {
      case Some((p, atoms)) if p == s.length && atoms.nonEmpty =>
        val f = Formula(atoms, 0, None)
        f.atomOrder = order.toList
        Some(f)
      case _ => None
    }
  }

  def isFormula(name: String): Boolean = parseFormula(name).isDefined
  def isOxide(name: String): Boolean = parseFormula(name).exists(_.hasOxygen)

  /** Molecular weight of a formula column name (reference MW(),
    * src/petropandas/_core.py:116-126). Throws on unparseable input. */
  def mw(name: String): Double =
    parseFormula(name).map(_.mass).getOrElse(
      throw new IllegalArgumentException(s"not a formula: $name"))

  def cationsPer(name: String): Double = parseFormula(name).map(_.cationsPer).getOrElse(0.0)
  def oxygensPer(name: String): Double = parseFormula(name).map(_.oxygensPer).getOrElse(0.0)
  def elementOf(name: String): String = parseFormula(name).map(_.elementOf).getOrElse("")

  /** Format ion column name; charge +-1 omits the digit
    * (reference: src/petropandas/_core.py:134-148). */
  def ionName(element: String, charge: Int): String = {
    val sign = if (charge > 0) "+" else "-"
    if (math.abs(charge) == 1) s"$element{$sign}"
    else s"$element{${math.abs(charge)}$sign}"
  }

  /** Parse an ion column name -> (element, charge), or None
    * (reference: src/petropandas/_core.py:151-166). */
  def parseIon(name: String): Option[(String, Int)] =
    parseFormula(name).filter(_.charge != 0).flatMap(f => f.ionElement.map(e => (e, f.charge)))

  /** Map element+charge to the standard EMPA oxide formula
    * (reference: src/petropandas/_core.py:169-183). */
  def ionToOxide(element: String, charge: Int): String =
    if (charge % 2 == 0) {
      val nO = charge / 2
      if (nO > 1) s"${element}O$nO" else s"${element}O"
    } else {
      val nO = charge
      if (nO == 1) s"${element}2O" else s"${element}2O$nO"
    }

  /** Oxide column name -> ion column name with charge 2*nO/nC
    * (reference: src/petropandas/_calc.py:234-249). */
  def oxideToIonCol(oxide: String): String = {
    val f = parseFormula(oxide).getOrElse(return oxide)
    val el = f.elementOf
    if (el.isEmpty) oxide
    else {
      val charge = (2.0 * f.oxygensPer / f.cationsPer).toInt
      ionName(el, charge)
    }
  }

  /** All columns of `cols` that contain `element` (oxide or ion spelling)
    * (reference: src/petropandas/_core.py:239-258). */
  def detectCols(cols: Seq[String], element: String): Seq[String] =
    cols.filter(c => parseFormula(c).exists(_.atoms.contains(element)))

  def detectCol(cols: Seq[String], element: String): String =
    detectCols(cols, element).headOption.getOrElse(
      throw new NoSuchElementException(s"No column found for element $element"))

  /** Canonical petrological display order for oxide columns
    * (reference: src/petropandas/_accessors.py:22-41,77-89): the 11
    * MAJOR_OXIDES in fixed order, then other oxides alphabetical, then
    * VOLATILES in fixed order, then non-oxides alphabetical — the exact
    * lists and ordering of `_sort_oxide_columns`. */
  val majorOxides: List[String] = List(
    "SiO2", "TiO2", "Al2O3", "FeO", "Fe2O3", "MnO", "MgO",
    "CaO", "Na2O", "K2O", "P2O5")
  val volatiles: List[String] = List("H2O", "CO2", "SO3")

  def sortOxideColumns(cols: Seq[String]): Seq[String] = {
    val majors = majorOxides.filter(cols.contains)
    val vols = volatiles.filter(cols.contains)
    val others = cols.filterNot(c => majors.contains(c) || vols.contains(c))
    val (otherOxides, nonOxides) = others.partition(isOxide)
    majors ++ otherOxides.sorted ++ vols ++ nonOxides.sorted
  }
}
