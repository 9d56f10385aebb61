package graft.util

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** TopKRows: the bounded-heap top-k aggregate must agree exactly with
  * the window rank it replaces, across partial/merge/serialize paths. */
class TopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("per-group k smallest structs equal window rank <= k, sorted") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), (col("doc_id") % 5).as("g"),
        length(col("text")).cast("long").as("len"))
    val w = Window.partitionBy("g").orderBy(col("len"), col("doc_id"))
    val want = docs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 7)
      .collect().map(r => (r.getLong(1), r.getInt(3), r.getLong(0))).toSet
    val got = docs.repartition(13) // force partial + merge + serialize
      .groupBy("g")
      .agg(TopK.topKRows(struct(col("len"), col("doc_id").as("id")), 7)
        .as("t"))
      .select(col("g"), posexplode(col("t")))
      .select(col("g"), (col("pos") + 1).cast("int").as("rk"),
        col("col.id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("groups smaller than k return all members; empty input none") {
    import spark.implicits._
    val df = Seq((1L, 10L), (2L, 5L), (3L, 7L)).toDF("id", "v")
    val out = df.groupBy(lit(0).as("g"))
      .agg(TopK.topKRows(struct(col("v"), col("id")), 10).as("t"))
      .select(size(col("t"))).head.getInt(0)
    assert(out == 3)
    assert(df.filter(col("id") < 0)
      .agg(TopK.topKRows(struct(col("v"), col("id")), 3).as("t"))
      .select(col("t")).head.getSeq[Any](0).isEmpty)
  }

  test("weightedSample (heap path) output equals the window formulation") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val got = graft.text.TextOps.weightedSample(docs, "doc_id", "source",
        length(col("text")).cast("double"), k = 9)
      .select("doc_id", "source", "rk", "key_micro")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3))).toSet
    // the original window formulation, inline
    val u = graft.text.TextOps.md5Hash60(concat(lit("wrs:"),
      col("doc_id").cast("string"))).cast("double") / math.pow(16.0, 15)
    val w = Window.partitionBy("source")
      .orderBy(col("key_micro").desc, col("doc_id").asc)
    val want = docs.withColumn("weight", length(col("text")).cast("double"))
      .filter(col("weight") > 0)
      .withColumn("key_micro",
        round(pow(u, lit(1.0) / col("weight")) * 1e6, 0).cast("long"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 9)
      .select("doc_id", "source", "rk", "key_micro")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3))).toSet
    assert(got == want)
  }

  test("perKeyRunningSum equals the window running sum") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), (col("doc_id") % 3).as("g"),
        length(col("text")).cast("long").as("len"))
    val w = Window.partitionBy("g").orderBy("doc_id")
    val want = docs.withColumn("cum", sum("len").over(w))
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    val got = DistRank.perKeyRunningSum(docs.repartition(11), "g",
        Seq(col("doc_id")), "len", "cum")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(got == want)
  }
}
