package graft.petro

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.chem.Chem

/** Mutable configuration defaults (reference: src/petropandas/_config.py:6-32).
  * NOTE: unlike the reference (which binds defaults at function-definition
  * time — a documented gotcha), these are read at call time. */
object PPConfig {
  var defaultSystem: String = "MnNCKFMASHTO"
  var defaultOxygen: Double = 0.01
  var defaultH2O: Double = -1.0
  var defaultDb: String = "mp"
  var defaultSysIn: String = "mol"
  def reset(): Unit = {
    defaultSystem = "MnNCKFMASHTO"; defaultOxygen = 0.01; defaultH2O = -1.0
    defaultDb = "mp"; defaultSysIn = "mol"
  }
}

/** Thermodynamic-software bulk sinks: THERMOCALC / PerpleX / MAGEMin
  * (reference: src/petropandas/_accessors.py:640-949). The numeric prep
  * is a Column pipeline; the text emitters produce a formatted string
  * column per row (format_string is codegen'd), so emitting a 100 TB
  * table's worth of script lines would still be a narrow scan->project.
  */
object Thermo {

  /** Component orders per system (reference: _accessors.py:47-73). */
  val tcSystems: Map[String, Seq[String]] = Map(
    "MnNCKFMASHTO" -> Seq("H2O", "SiO2", "Al2O3", "CaO", "MgO", "FeO", "K2O", "Na2O", "TiO2", "MnO", "O"),
    "NCKFMASHTO" -> Seq("H2O", "SiO2", "Al2O3", "CaO", "MgO", "FeO", "K2O", "Na2O", "TiO2", "O"),
    "KFMASH" -> Seq("H2O", "SiO2", "Al2O3", "MgO", "FeO", "K2O"),
    "NCKFMASHTOCr" -> Seq("H2O", "SiO2", "Al2O3", "MgO", "FeO", "K2O", "Na2O", "TiO2", "O", "Cr2O3"),
    "NCKFMASTOCr" -> Seq("SiO2", "Al2O3", "CaO", "MgO", "FeO", "TiO2", "O", "Cr2O3"))

  val perplexSystems: Map[String, Seq[String]] =
    tcSystems.map { case (k, v) => k -> v.map(c => if (c == "O") "O2" else c) }

  val magemimSystems: Map[String, Seq[String]] = Map(
    "ig" -> Seq("SiO2", "Al2O3", "CaO", "MgO", "FeO", "K2O", "Na2O", "TiO2", "O", "Cr2O3", "H2O"),
    "mp" -> Seq("SiO2", "Al2O3", "CaO", "MgO", "FeO", "K2O", "Na2O", "TiO2", "O", "MnO", "H2O"),
    "mb" -> Seq("SiO2", "Al2O3", "CaO", "MgO", "FeO", "K2O", "Na2O", "TiO2", "O", "H2O"),
    "um" -> Seq("SiO2", "Al2O3", "MgO", "FeO", "O", "H2O", "S"),
    "ume" -> Seq("SiO2", "Al2O3", "MgO", "FeO", "O", "H2O", "S", "CaO", "Na2O"),
    "mpe" -> Seq("SiO2", "Al2O3", "CaO", "MgO", "FeO", "K2O", "Na2O", "TiO2", "O", "MnO", "H2O", "CO2", "S"),
    "mbe" -> Seq("SiO2", "Al2O3", "CaO", "MgO", "FeO", "K2O", "Na2O", "TiO2", "O", "H2O"),
    "mtl" -> Seq("SiO2", "Al2O3", "CaO", "MgO", "FeO", "Na2O"))

  /** P8: exact-column projection, missing -> 0.0, in requested order
    * (reference: _accessors.py:112-117 `_reframe_columns`). */
  def reframe(df: DataFrame, columns: Seq[String], carry: Seq[String] = Nil): DataFrame =
    df.select(carry.map(col) ++ columns.map { c =>
      if (df.columns.contains(c)) col(c) else lit(0.0).as(c)
    }: _*)

  /** S10: shared thermo prep (reference: _thermo_bulk_prep,
    * _accessors.py:728-786). `df` must already be the cleaned bulk
    * (formula columns + carry). */
  def thermoBulkPrep(df: DataFrame, systemCols: Seq[String],
      oxygenKey: String = "O", oxygenMult: Double = 1.0,
      useMolprop: Boolean = true, oxygen: Double = 0.01, h2o: Double = -1.0,
      carry: Seq[String] = Nil): DataFrame = {
    var work = Convert.apatiteCorrection(Convert.fe2o3ToFeo(df))
    if (systemCols.contains("H2O") && !work.columns.contains("H2O")) {
      val total = Convert.rowSum(Minerals.valueCols(work, carry))
      val h2oCol =
        if (h2o == -1.0) greatest(lit(100.0) - total, lit(0.0))
        else lit(h2o) * total / (lit(100.0) - lit(h2o))
      work = work.withColumn("H2O", h2oCol)
    }
    val use = work.columns.filter(systemCols.contains).toSeq
    val proj = work.select(carry.map(col) ++ use.map(col): _*)
    val target = 100.0 - oxygen * oxygenMult
    val asMoles =
      if (useMolprop) use.map(c => (col(c) / lit(Chem.mw(c))).as(c))
      else use.map(col)
    val molesDf = proj.select(carry.map(col) ++ asMoles: _*)
    val total2 = Convert.rowSum(use)
    val scaled = molesDf.select(carry.map(col) ++
      use.map(c => (col(c) / total2 * lit(target)).as(c)): _*)
    val withO =
      if (systemCols.contains(oxygenKey))
        scaled.withColumn(oxygenKey, lit(oxygen * oxygenMult))
      else scaled
    reframe(withO, systemCols, carry)
  }

  /** S7: THERMOCALC bulk script lines (reference: _accessors.py:790-836).
    * Returns (header, DataFrame with a `line` string column). */
  def tcBulk(df: DataFrame, labelCol: Column,
      system: String = PPConfig.defaultSystem,
      oxygen: Double = PPConfig.defaultOxygen,
      h2o: Double = PPConfig.defaultH2O,
      carry: Seq[String] = Nil): (String, DataFrame) = {
    require(tcSystems.contains(system), s"Invalid system: $system")
    val cols = tcSystems(system)
    val prep = thermoBulkPrep(df, cols, "O", 1.0, useMolprop = true,
      oxygen = oxygen, h2o = h2o, carry = carry)
    val header = "bulk" + cols.map(c => f"$c%7s").mkString
    val fmt = "bulk" + cols.map(_ => " %6.3f").mkString + "  %% %s"
    val line = format_string(fmt, cols.map(col) :+ labelCol: _*)
    (header, prep.withColumn("line", line))
  }

  /** S8: PerpleX thermodynamic component list (reference:
    * _accessors.py:840-886). One formatted line per component of the
    * first row -> emitted as a per-row multi-line `block` column. */
  def perplexBulk(df: DataFrame,
      system: String = PPConfig.defaultSystem,
      oxygen: Double = PPConfig.defaultOxygen,
      h2o: Double = PPConfig.defaultH2O,
      carry: Seq[String] = Nil): DataFrame = {
    require(perplexSystems.contains(system), s"Invalid system: $system")
    val cols = perplexSystems(system)
    val prep = thermoBulkPrep(df, cols, "O2", 2.0, useMolprop = true,
      oxygen = oxygen, h2o = h2o, carry = carry)
    val lines = cols.map { c =>
      format_string(s"%-6s1 %8.5f      0.00000      0.00000     molar amount",
        lit(c), col(c))
    }
    // begin/end wrapper lines are part of the reference's emitted text
    // (_accessors.py:882-886)
    prep.withColumn("block", concat_ws("\n",
      lit("begin thermodynamic component list") +: lines :+
        lit("end thermodynamic component list"): _*))
  }

  /** S9: MAGEMin bulk input lines (reference: _accessors.py:890-949). */
  def magemim(df: DataFrame, labelCol: Column,
      db: String = PPConfig.defaultDb,
      sysIn: String = PPConfig.defaultSysIn,
      oxygen: Double = PPConfig.defaultOxygen,
      h2o: Double = PPConfig.defaultH2O,
      comment: String = "petropandas",
      carry: Seq[String] = Nil): DataFrame = {
    require(magemimSystems.contains(db), s"Invalid database: $db")
    val cols = magemimSystems(db)
    val prep = thermoBulkPrep(df, cols, "O", 1.0,
      useMolprop = sysIn == "mol", oxygen = oxygen, h2o = h2o, carry = carry)
    val oxides = cols.mkString(", ")
    val values = format_string(cols.map(_ => "%.4f").mkString(", "), cols.map(col): _*)
    prep.withColumn("line",
      concat(labelCol, lit(s";$comment;$db;$sysIn;[$oxides];["), values, lit("];")))
  }
}
