package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** S1: the reference's five bundled datasets as DataFrames
  * (reference: src/petropandas/data/__init__.py — module-level
  * pandas.read_csv of each file).
  *
  * `dir` defaults to the reference checkout's data directory; callers
  * ship their own copies in production. All loads are schema-inferring
  * CSV reads; chemistry typing/cleaning stays the job of
  * `PetroFrame.clean` exactly as the reference applies its accessors
  * after load. */
object Datasets {

  val DefaultDir = "/root/reference/src/petropandas/data"

  private def csv(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$dir/$name.csv")

  /** 315 EMPA analyses, 21 mineral groups x 15 (minerals.csv). */
  def minerals(spark: SparkSession, dir: String = DefaultDir): DataFrame =
    csv(spark, dir, "minerals")

  /** Whole-rock suite with metadata + H2O_PLUS alias column (sazava.csv). */
  def sazava(spark: SparkSession, dir: String = DefaultDir): DataFrame =
    csv(spark, dir, "sazava")

  /** 9 labelled bulk compositions (bulk.csv). */
  def bulk(spark: SparkSession, dir: String = DefaultDir): DataFrame =
    csv(spark, dir, "bulk")

  /** The 1-row average-pelite composition (avgpelite.csv). */
  def avgpelite(spark: SparkSession, dir: String = DefaultDir): DataFrame =
    csv(spark, dir, "avgpelite")

  /** 99-point ordered garnet traverse (grt_profile.csv). The reference
    * relies on pandas row order for the traverse position; Spark makes
    * that explicit as a `position` column (file order — the bundled
    * profile is a single small file, so the single-partition
    * zipWithIndex is exact, and downstream window ops order by the
    * column instead of assuming physical order). */
  def grtProfile(spark: SparkSession, dir: String = DefaultDir): DataFrame = {
    val raw = csv(spark, dir, "grt_profile").coalesce(1)
    val schema = StructType(raw.schema.fields :+ StructField("position", LongType))
    val rows = raw.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(rows, schema)
  }
}
