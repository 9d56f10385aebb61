package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Schema-drift net for the relational read paths — the r7 lesson
  * generalized: the driver has regenerated the testdata with a
  * different physical encoding twice (events.ts nanos -> micros), and
  * an encoding change must surface as a RED TEST here, not as silently
  * missing correctness rows. The events column is covered by the
  * EventStreams 3-encoding spec; this one covers the OTHER
  * drift-prone axes on lineitem/orders: decimal-encoded money columns
  * (parquet DECIMAL instead of DOUBLE), DATE instead of TIMESTAMP
  * dates, and narrowed numerics (float reals / int32 keys). Every
  * q-track query must still analyze against each variant, and the
  * lineitem/orders readers must execute end-to-end. */
class SchemaDriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Rewrite sf0.001 with per-table column casts applied; unlisted
    * tables round-trip through Spark unchanged. */
  private def variant(name: String)(
      casts: Map[String, DataFrame => DataFrame]): String = {
    assume(new java.io.File(dir).exists, s"testdata $dir absent")
    val out = java.nio.file.Files.createTempDirectory(s"drift_$name").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tables.foreach { t =>
      val src = spark.read.parquet(s"$dir/$t.parquet")
      casts.getOrElse(t, identity[DataFrame] _)(src)
        .coalesce(1).write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    out
  }

  private def cast(df: DataFrame, types: (String, String)*): DataFrame =
    types.foldLeft(df) { case (d, (c, ty)) =>
      d.withColumn(c, col(c).cast(ty)) }

  // the q-track entries that actually scan lineitem/orders get a full
  // end-to-end execution; everything else is analysis-checked
  private val executed = Set("q01_pricing_summary", "q02_revenue_topk",
    "q03_nation_revenue", "q04_brand_quantity", "q05_customers_no_orders",
    "q06_top_order_per_customer", "q13_rollup_revenue",
    "q17_price_quantiles", "q18_cube_revenue", "q23_salted_join")

  private def sweep(label: String, vdir: String): Unit = {
    val failures = Relational.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val df = fn(spark, vdir)
          df.schema // forces analysis
          if (executed(name)) df.count() // forces execution + codegen
          None
        } catch {
          case e: Throwable => Some(s"$name: " + Option(e.getMessage)
            .getOrElse(e.getClass.getName).linesIterator.take(2)
            .mkString(" | "))
        }
    }
    assert(failures.isEmpty,
      s"[$label] ${failures.size} queries broke:\n${failures.mkString("\n")}")
  }

  test("decimal-encoded money columns + int32 keys still read") {
    val vdir = variant("decimal")(Map(
      "lineitem" -> (df => cast(df,
        "l_quantity" -> "decimal(12,2)", "l_extendedprice" -> "decimal(12,2)",
        "l_discount" -> "decimal(12,4)", "l_tax" -> "decimal(12,4)",
        "l_orderkey" -> "int", "l_partkey" -> "int", "l_suppkey" -> "int")),
      "orders" -> (df => cast(df,
        "o_totalprice" -> "decimal(12,2)", "o_orderkey" -> "int",
        "o_custkey" -> "int"))))
    sweep("decimal", vdir)
  }

  test("DATE-encoded date columns still read") {
    val vdir = variant("date")(Map(
      "lineitem" -> (df => cast(df, "l_shipdate" -> "date")),
      "orders" -> (df => cast(df, "o_orderdate" -> "date"))))
    sweep("date", vdir)
  }

  test("narrowed numerics (float reals, int32 keys) still read") {
    val vdir = variant("narrow")(Map(
      "lineitem" -> (df => cast(df,
        "l_quantity" -> "float", "l_extendedprice" -> "float",
        "l_discount" -> "float", "l_tax" -> "float",
        "l_orderkey" -> "int", "l_partkey" -> "int", "l_suppkey" -> "int",
        "l_linenumber" -> "smallint")),
      "orders" -> (df => cast(df,
        "o_totalprice" -> "float", "o_orderkey" -> "int",
        "o_custkey" -> "int"))))
    sweep("narrow", vdir)
  }

  // drift-prone axes on the text/embedding tables: int32 ids and
  // widened embedding elements (the operators cast array<double>
  // everywhere, so a float<->double re-encode must be a non-event)
  private val executedText = Set("t01_exact_dedup", "t02_token_stats",
    "t09_ivf_cells", "t59_mrl_truncate", "t70_quality_sample",
    "t71_hash_embed")

  private def sweepText(label: String, vdir: String): Unit = {
    val failures = TextQueries.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val df = fn(spark, vdir)
          df.schema
          if (executedText(name)) df.count()
          None
        } catch {
          case e: Throwable => Some(s"$name: " + Option(e.getMessage)
            .getOrElse(e.getClass.getName).linesIterator.take(2)
            .mkString(" | "))
        }
    }
    assert(failures.isEmpty,
      s"[$label] ${failures.size} queries broke:\n${failures.mkString("\n")}")
  }

  test("documents/embeddings with int32 ids + double embeddings still read") {
    val vdir = variant("textdrift")(Map(
      "documents" -> (df => cast(df,
        "doc_id" -> "int", "n_chars" -> "int")),
      "embeddings" -> (df => cast(df,
        "vec_id" -> "int", "embedding" -> "array<double>"))))
    sweepText("textdrift", vdir)
  }
}
