package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** saltedJoin: identical results to the plain join on skewed data, with
  * the hot key spread across salt buckets. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 10,000 rows for hot key 1, a handful elsewhere — the shape that
  // makes one reducer the straggler in a plain shuffle join
  private def facts = spark.range(10000)
    .select(lit(1L).as("k"), col("id").as("row_id"), (col("id") % 7).as("v"))
    .unionAll(spark.range(50)
      .select((col("id") + 2).as("k"), (col("id") + 10000).as("row_id"),
        col("id").as("v")))
  private def dim = (1L to 60L).map(k => (k, s"name_$k")).toDF("k", "label")

  test("salted inner join equals the plain join, salt column dropped") {
    val plain = facts.join(dim, Seq("k")).select("k", "row_id", "v", "label")
    val salted = Skew.saltedJoin(facts, dim, Seq("k"),
        saltBy = col("row_id"), nSalts = 8)
      .select("k", "row_id", "v", "label")
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("hot key actually spreads across salt buckets") {
    // Skew.saltCol is the SAME expression saltedJoin applies to the big
    // side, so a regression in the operator's salt construction (constant
    // salt, missing pmod, wrong column) fails this distribution check.
    val salted = facts.withColumn("__salt", Skew.saltCol(col("row_id"), 8))
    val perBucket = salted.filter(col("k") === 1)
      .groupBy("__salt").count().collect()
    assert(perBucket.length == 8,
      s"hot key only reached ${perBucket.length} of 8 salt buckets")
    assert(perBucket.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 8))
    // roughly uniform: no bucket holds more than 2x its fair share
    assert(perBucket.forall(_.getLong(1) < 2 * 10000 / 8))
  }

  test("left and left_anti joins survive key refinement") {
    val partial = dim.filter(col("k") <= 30)
    val left = Skew.saltedJoin(facts, partial, Seq("k"),
      saltBy = col("row_id"), nSalts = 4, joinType = "left")
    val plainLeft = facts.join(partial, Seq("k"), "left")
    assert(left.count() == plainLeft.count())
    assert(left.filter(col("label").isNull).count() ==
      plainLeft.filter(col("label").isNull).count())
    val anti = Skew.saltedJoin(facts, partial, Seq("k"),
      saltBy = col("row_id"), nSalts = 4, joinType = "left_anti")
    assert(anti.count() == facts.join(partial, Seq("k"), "left_anti").count())
  }

  test("right/full joins and salt-name collisions are rejected") {
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(facts, dim, Seq("k"), col("row_id"), 4, "right")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(facts.withColumn("__salt", lit(1)), dim, Seq("k"),
        col("row_id"), 4)
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(facts, dim, Seq("k"), col("row_id"), 0)
    }
  }
}
