package graft.petro

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.chem.Chem

/** Stoichiometry quality scoring (reference: src/petropandas/_calc.py:451-625
  * + the check_stoichiometry accessor, _accessors.py:168-228).
  *
  * All seven criteria are Column cascades over the APFU + site-allocation
  * expressions. The reference emits all-NaN columns for inapplicable
  * criteria and drops them with `dropna(axis=1, how='all')`; here
  * applicability is schema-static, so inapplicable criteria are simply
  * not emitted — same observable result, decided at plan-build time.
  */
object Stoich {

  /** A6: trapezoidal score — 1 inside [lo,hi], linear decay over margin
    * (reference: _calc.py:451-471). */
  def trapezoid(value: Column, lo: Double, hi: Double, margin: Double = 1.5): Column =
    when(value >= lo && value <= hi, 1.0)
      .when(value < lo, greatest((value - lit(lo - margin)) / margin, lit(0.0)))
      .otherwise(greatest((lit(hi + margin) - value) / margin, lit(0.0)))

  /** A7: analytical-total score (reference: _calc.py:474-487). */
  def scoreAnalyticalTotal(oxideTotal: Column, range: (Double, Double)): Column =
    trapezoid(oxideTotal, range._1, range._2)

  /** A8: cation-deviation score (reference: _calc.py:490-506). */
  def scoreCationDeviation(apfuSum: Column, idealCations: Double): Column =
    greatest(lit(1.0) - abs(apfuSum - idealCations) / idealCations, lit(0.0))

  /** A9: charge-balance score (reference: _calc.py:509-524). */
  def scoreChargeBalance(apfuCols: Seq[String], nOxygens: Double): Column = {
    val totalCharge = apfuCols.map { c =>
      col(c) * lit(Chem.parseIon(c).map(_._2.toDouble).getOrElse(0.0))
    }.reduceOption(_ + _).getOrElse(lit(0.0))
    exp(-abs(totalCharge - lit(2.0 * nOxygens)) / 0.5)
  }

  /** A5: the full 7-criterion score frame for one mineral. Criteria are
    * computed over the STAGED allocation frame (take columns named per
    * Project layer) so the per-site remaining chains stay O(k^2) nodes
    * — the single-select expression form doubles per ion and blows up
    * for wide-site minerals like amphibole. */
  def checkStoichiometry(spec: MineralSpec, df: DataFrame,
      carry: Seq[String] = Nil, units: Units = Units.WtPct): DataFrame = {
    val schema = ChemSchema.of(df)
    val oxTotal = Convert.rowSum(schema.oxideCols)
    val df2 = df.withColumn("__oxt", oxTotal)
    val innerCarry = carry :+ "__oxt"
    val rawApfu = Minerals.rawApfu(spec, df2, innerCarry, units)
    val ionCols = Minerals.valueCols(rawApfu, innerCarry)
    val apfuSum = Convert.rowSum(ionCols)
    val (apfu, takeCols) = Minerals.allocateSitesKeepAll(spec, rawApfu, innerCarry)
    val alloc: Seq[(String, String, Column)] = takeCols.map { c =>
      val Array(site, ion) = c.split(":", 2)
      (site, ion, col(c))
    }
    val siteParts = alloc.filter(_._2 != "_unallocated")
    val unallocParts = alloc.filter(_._2 == "_unallocated")

    val out = scala.collection.mutable.ListBuffer.empty[Column]
    out += scoreAnalyticalTotal(col("__oxt"), spec.totalRange).as("analytical_total")
    spec.idealCations.foreach { ic =>
      out += scoreCationDeviation(apfuSum, ic).as("cation_deviation")
    }
    out += scoreChargeBalance(ionCols, spec.nOxygens).as("charge_balance")
    // A10: Fe3+ validity — applicable iff the split produced Fe{3+}
    if (ionCols.contains("Fe{3+}")) {
      val ok3 = col("Fe{3+}") >= 0.0
      val valid = if (ionCols.contains("Fe{2+}")) ok3 && col("Fe{2+}") >= 0.0 else ok3
      out += when(valid, 1.0).otherwise(0.0).as("fe3+_validity")
    }
    // A11: site vacancies — mean unallocated vs mean capacity
    val caps = unallocParts.flatMap { case (site, _, _) =>
      spec.sites.find(s => s.name == site && s.capacity > 0).map(_.capacity)
    }
    if (unallocParts.nonEmpty && caps.nonEmpty) {
      val meanCap = caps.sum / caps.length
      val meanUnalloc = unallocParts.map(_._3).reduce(_ + _) / unallocParts.length.toDouble
      out += greatest(lit(1.0) - meanUnalloc / meanCap, lit(0.0)).as("site_vacancies")
    }
    // A12: leftover cations
    if (siteParts.nonEmpty) {
      val allocated = siteParts.map(_._3).reduce(_ + _)
      val safeTotal = when(apfuSum === 0.0, 1.0).otherwise(apfuSum)
      val leftoverFrac = greatest((apfuSum - allocated) / safeTotal, lit(0.0))
      out += greatest(lit(1.0) - leftoverFrac, lit(0.0)).as("leftover_cations")
    }
    // A13: tetrahedral fill — first site named T*, trapezoid margin 0.15
    spec.sites.find(_.name.startsWith("T")).foreach { tSite =>
      val tParts = siteParts.filter(_._1 == tSite.name)
      if (tParts.nonEmpty) {
        val tSum = tParts.map(_._3).reduce(_ + _)
        out += trapezoid(tSum, tSite.capacity, tSite.capacity, margin = 0.15)
          .as("tetrahedral_fill")
      }
    }
    apfu.select(carry.map(col) ++ out: _*)
  }
}
