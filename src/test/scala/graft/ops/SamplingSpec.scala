package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sampling.stratifiedTakeExact: window-row_number agreement on skewed
  * strata, exact-k/short-stratum behavior, null strata, guards. */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // skewed strata: "big" 1000 rows, "small" 3, one NULL stratum of 5
  private def df = spark.range(1008).selectExpr(
    "id",
    """CASE WHEN id < 1000 THEN 'big'
            WHEN id < 1003 THEN 'small'
            ELSE NULL END AS src""",
    "(id * 2654435761L) % 4294967296L AS h",
    "cast(id AS double) / 7 AS payload")

  test("equals the row_number window formulation on every stratum, " +
      "including the NULL stratum and k > stratum size") {
    val k = 10
    val got = Sampling.stratifiedTakeExact(df, "src", "id",
        Seq(col("h")), k)
      .select("src", "rk", "id", "payload")
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy("h", "id")
    val want = df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("src", "rk", "id", "payload")
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == want)
    val bySrc = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(bySrc == Map(Some("big") -> 10, Some("small") -> 3, None -> 5),
      "exactly k from the big stratum, whole short strata, NULL kept")
  }

  test("selection is deterministic across partitionings") {
    val a = Sampling.stratifiedTakeExact(df.repartition(13), "src", "id",
      Seq(col("h")), 7).select("src", "rk", "id").collect().toSet
    val b = Sampling.stratifiedTakeExact(df.coalesce(1), "src", "id",
      Seq(col("h")), 7).select("src", "rk", "id").collect().toSet
    assert(a == b)
  }

  test("plan is heap-aggregate shaped: no Window, no global Sort of " +
      "the stratum") {
    val plan = Sampling.stratifiedTakeExact(df, "src", "id",
      Seq(col("h")), 5).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window funnel in plan:\n$plan")
  }

  test("a selected NULL-id row survives the join back with its rank") {
    val d = Seq((Option("s"), Option(1L)), (Option("s"), Option.empty[Long]),
      (Option("s"), Option(3L))).toDF("src", "id")
      .withColumn("h", coalesce(col("id"), lit(-1L)))
    val got = Sampling.stratifiedTakeExact(d, "src", "id",
        Seq(col("h")), 2)
      .select("rk", "id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet
    // order by h: null id has h=-1 -> rank 1; id=1 -> rank 2
    assert(got == Set((1L, None), (2L, Some(1L))),
      s"NULL-id winner must not vanish: $got")
  }

  test("guards: positive k, existing columns, rank-name collision") {
    intercept[IllegalArgumentException] {
      Sampling.stratifiedTakeExact(df, "src", "id", Seq(col("h")), 0)
    }
    intercept[IllegalArgumentException] {
      Sampling.stratifiedTakeExact(df, "nope", "id", Seq(col("h")), 1)
    }
    intercept[IllegalArgumentException] {
      Sampling.stratifiedTakeExact(df.withColumn("rk", lit(1)),
        "src", "id", Seq(col("h")), 1)
    }
    intercept[IllegalArgumentException] {
      Sampling.stratifiedTakeExact(df, "src", "id", Nil, 1)
    }
  }
}
