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

  test("buffer-backed values (strings) are deep-copied, not aliased") {
    import spark.implicits._
    // many rows per partition so the reused input row would corrupt
    // aliased UTF8Strings; verify values survive intact
    val df = spark.range(2000).selectExpr("id % 4 as g",
      "concat('v', lpad(cast(id as string), 6, '0')) as s")
    val got = df.groupBy("g")
      .agg(TopK.topKRows(col("s"), 3).as("t"))
      .select(col("g"), col("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    (0L until 4L).foreach { g =>
      val want = (0L until 2000L).filter(_ % 4 == g)
        .map(i => f"v$i%06d").sorted.take(3)
      assert(got(g) == want, s"group $g")
    }
  }

  test("weightedSample keeps NULL-source rows as their own stratum") {
    import spark.implicits._
    val df = Seq((1L, "a", "x y z"), (2L, "a", "p q"),
      (3L, null.asInstanceOf[String], "m n o"),
      (4L, null.asInstanceOf[String], "r s"))
      .toDF("doc_id", "source", "text")
    val out = graft.text.TextOps.weightedSample(df, "doc_id", "source",
        length(col("text")).cast("double"), k = 1)
      .select("doc_id", "source").collect()
    assert(out.length == 2, s"one winner per stratum incl. null: " +
      s"${out.toSeq}")
    assert(out.count(_.isNullAt(1)) == 1, "the null stratum keeps a row")
  }

  test("perKeyRunningSum treats NULL values as 0 like the window sum") {
    import spark.implicits._
    val df = Seq((1L, 0L, java.lang.Long.valueOf(5L)),
      (2L, 0L, null.asInstanceOf[java.lang.Long]),
      (3L, 0L, java.lang.Long.valueOf(7L)))
      .toDF("id", "g", "v")
    val got = DistRank.perKeyRunningSum(df, "g", Seq(col("id")), "v", "cum")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 5L, 2L -> 5L, 3L -> 12L))
  }

  test("dropNearDuplicatesBy: NaN score wins its cluster (window parity)") {
    import spark.implicits._
    val df = Seq((1L, 2.0), (2L, Double.NaN), (3L, 9.0))
      .toDF("doc_id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a_id", "b_id")
    val kept = graft.text.TextOps.dropNearDuplicatesBy(df, "doc_id",
        pairs, col("q"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // Spark orders NaN greater than every double: doc 2 survives
    assert(kept == Set(2L), kept)
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
