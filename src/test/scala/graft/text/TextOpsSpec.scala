package graft.text

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TextOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def pairs(ps: (Long, Long)*) = {
    val schema = StructType(Seq(
      StructField("a_id", LongType), StructField("b_id", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(ps.map(p => Row(p._1, p._2)), 2), schema)
  }

  test("nearDupClusters resolves transitive chains to the minimum id") {
    // chain 1-2-3-4 (never directly 1-4) + separate pair 10-11
    val c = TextOps.nearDupClusters(pairs((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("dropNearDuplicates keeps canonical members and untouched docs") {
    import spark.implicits._
    val docs = (1L to 6L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val kept = TextOps.dropNearDuplicates(docs, "doc_id", pairs((1L, 2L), (2L, 5L)))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // cluster {1,2,5} -> keep 1; docs 3,4,6 not in any pair -> kept
    assert(kept == Seq(1L, 3L, 4L, 6L))
  }

  test("approximate vocabulary size tracks the exact distinct count (SURVEY §7 sketch op)") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = docs.select(explode(TextOps.tokens(col("text"))).as("tok"))
    val exact = toks.select(countDistinct("tok")).collect()(0).getLong(0)
    val approx = toks.select(approx_count_distinct("tok", 0.02)).collect()(0).getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("nearDupClusters converges on a long chain within the iteration cap") {
    val chain = (1L until 40L).map(i => (i, i + 1))
    val c = TextOps.nearDupClusters(pairs(chain: _*), maxIters = 20)
    assert(c.filter(org.apache.spark.sql.functions.col("cluster") =!= 1L).count() == 0)
  }
}
