package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Bucketed co-located join: one write-time shuffle, then equi-joins on
  * the bucket key plan WITHOUT any Exchange. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("same-bucketed tables join with zero shuffle and match the plain join") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    Bucketing.writeBucketed(li, "li_b", Seq("l_orderkey"), 4)
    Bucketing.writeBucketed(ord, "ord_b", Seq("l_orderkey"), 4)
    // tiny test tables would otherwise broadcast (whose BroadcastExchange
    // is not the shuffle this test is about) — force sort-merge
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.cosortedJoin(spark, "li_b", "ord_b", Seq("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() ==
        li.join(ord, "l_orderkey").count(), "bucketed join changes results")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("aggregation on the bucket key is also exchange-free") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    Bucketing.writeBucketed(li, "li_agg_b", Seq("l_orderkey"), 4)
    try {
      val agg = spark.table("li_agg_b")
        .groupBy("l_orderkey").agg(sum("l_quantity"))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
        "bucket-key aggregation still shuffles")
    } finally spark.sql("DROP TABLE IF EXISTS li_agg_b")
  }
}
