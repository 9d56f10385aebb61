package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.petro.{Minerals, PetroFrame}

/** S1 bundled datasets — shapes per FIXTURES.md §1 and the reference's
  * own pytest suite, plus an end-to-end pipeline drive over the real
  * profile data. */
class DatasetsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bundled dataset shapes match the reference (data/__init__.py)") {
    assert(Datasets.minerals(spark).count() == 315)
    assert(Datasets.grtProfile(spark).count() == 99)
    assert(Datasets.sazava(spark).count() == 14)
    assert(Datasets.bulk(spark).count() == 9)
    assert(Datasets.avgpelite(spark).count() == 1)
  }

  test("minerals.csv: 21 groups x 15 analyses, filterable by Mineral") {
    val m = Datasets.minerals(spark)
    val groups = m.groupBy("Mineral").count().collect()
    assert(groups.length == 21)
    assert(groups.forall(_.getLong(1) == 15))
  }

  test("grt_profile carries an explicit traverse position in file order") {
    val p = Datasets.grtProfile(spark)
    val first = p.orderBy("position").select("Label").limit(2).collect()
    assert(first.map(_.getString(0)).toSeq == Seq("p-01", "p-02"))
    assert(p.agg(max("position")).collect()(0).getLong(0) == 98L)
  }

  test("sazava H2O_PLUS alias resolves through the cleaning contract") {
    val s = Datasets.sazava(spark)
    assert(s.columns.contains("H2O_PLUS"))
    val pf = PetroFrame.clean(s,
      carry = Seq("Sample", "Intrusion", "Locality", "Petrology", "Outcrop", "idx"))
    assert(pf.df.columns.contains("H2O"))
    assert(!pf.df.columns.contains("H2O_PLUS"))
  }

  test("profile end members over the real traverse: garnet rim-core zoning runs") {
    // Snapshot the (global, JVM-wide) codegen-error counter so the
    // assertion below pins failures to THIS test's aggregates, not to
    // whichever suite happened to run earlier in the shared session.
    val codegenErrorsBefore = graft.CodegenWatch.errors.get()
    val p = Datasets.grtProfile(spark)
    val pf = PetroFrame.clean(p, carry = Seq("Label", "position"))
    // The end-member cascade is fine to WRITE (Verify streams it to
    // parquet), but fusing all six deep trees into one no-key
    // HashAggregate blows janino's 64KB method limit — Spark logs
    // `ERROR CodeGenerator` and silently drops to interpreted eval.
    // Materialize once, then aggregate over the shallow result; same
    // barrier-before-repeated-consumption shape as curateCorpus.
    val e = Minerals.endMembers(Minerals.Grt, pf.df,
      carry = Seq("Label", "position")).localCheckpoint()
    assert(e.count() == 99)
    val sums = e.select(
      (col("Prp") + col("Alm") + col("Sps") + col("Grs") + col("Adr") + col("Uvr")).as("s"))
    assert(sums.filter(abs(col("s") - 100.0) > 1e-6).count() == 0)
    assert(graft.CodegenWatch.errors.get() == codegenErrorsBefore,
      "whole-stage codegen fell back to interpreted evaluation in this test's aggregates")
  }
}
