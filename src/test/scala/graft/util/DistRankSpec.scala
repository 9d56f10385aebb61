package graft.util

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** DistRank: the skew-proof per-key row number must agree with the
  * window it replaces, on both balanced and adversarially skewed
  * keys. */
class DistRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("perKeyRowNumber equals window row_number on balanced keys") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), (col("doc_id") % 7).as("k"),
        length(col("text")).as("len"))
    val w = Window.partitionBy("k").orderBy(desc("len"), col("doc_id"))
    val want = docs.withColumn("rank", row_number().over(w).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    val got = DistRank.perKeyRowNumber(docs, "k",
        Seq(desc("len"), col("doc_id")), "rank")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(got.size == want.size)
    assert(got == want)
  }

  test("one mega-key (all rows in a single key) still ranks exactly " +
      "and spreads across partitions") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), lit(0L).as("k"), length(col("text")).as("len"))
    val ranked = DistRank.perKeyRowNumber(docs, "k",
      Seq(desc("len"), col("doc_id")), "rank")
    // exactness: ranks are a permutation of 1..n matching the total order
    val rows = ranked.collect()
      .map(r => (r.getLong(3), r.getInt(2), r.getLong(0)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to rows.length).toSeq)
    rows.sliding(2).foreach { case Array((_, l1, id1), (_, l2, id2)) =>
      assert(l1 > l2 || (l1 == l2 && id1 < id2),
        "rank order must follow (len desc, id asc)")
      case _ => ()
    }
    // skew posture: the mega-key's rows must NOT collapse into one task
    val partSizes = ranked.rdd
      .mapPartitions(it => Iterator.single(it.size)).collect()
    assert(partSizes.count(_ > 0) > 1,
      s"mega-key must spread over several partitions: ${partSizes.toSeq}")
    assert(partSizes.max < rows.length,
      "no single partition may hold the whole key")
  }

  test("ranks are stable across input partitionings") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), (col("doc_id") % 3).as("k"),
        length(col("text")).as("len"))
    def run(df: org.apache.spark.sql.DataFrame) =
      DistRank.perKeyRowNumber(df, "k", Seq(desc("len"), col("doc_id")),
        "rank").collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(run(docs) == run(docs.repartition(11)))
  }
}
