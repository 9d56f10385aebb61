package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** PageRank: exact fixed-point values on hand graphs, multigraph and
  * dangling semantics, determinism, and the hub-ordering property on
  * the real fixture. */
class LinkRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    LinkRank.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a 2-cycle is the exact fixed point: every rank stays 1e6") {
    // r'(a) = 150000 + 85 * (1e6 div 1) div 100 = 1e6 — stable forever
    val r = ranks(Seq(1L -> 2L, 2L -> 1L), iters = 5)
    assert(r == Map(1L -> 1000000L, 2L -> 1000000L), r)
  }

  test("star graph: hand-computed exact micro ranks") {
    // 4 spokes -> hub. Spokes have no inbound: rank 150000 from iter 1
    // on. Hub: iter 1 sees spoke rank 1e6 -> 150000 + 85*4e6 div 100 =
    // 3550000; iter >= 2 sees spokes at 150000 ->
    // 150000 + (85 * 600000) div 100 = 660000.
    val edges = (1L to 4L).map(_ -> 10L)
    val r1 = ranks(edges, iters = 1)
    assert(r1(10L) == 3550000L && r1(1L) == 150000L, r1)
    val r3 = ranks(edges, iters = 3)
    assert(r3(10L) == 660000L && r3(4L) == 150000L, r3)
  }

  test("out-degree splits contributions with floor division") {
    // 1 -> {2, 3}: each target gets floor(1e6 / 2) = 500000 in iter 1
    val r = ranks(Seq(1L -> 2L, 1L -> 3L), iters = 1)
    assert(r(2L) == 150000L + 85L * 500000L / 100L, r)
    assert(r(2L) == r(3L))
  }

  test("multi-edges endorse multiply; dangling targets appear with base rank") {
    // 1 -> 2 twice (outdeg 2, two contributions of 500000 each = one
    // full share) vs a single 3 -> 4 edge (full share as well): equal
    val r = ranks(Seq(1L -> 2L, 1L -> 2L, 3L -> 4L), iters = 1)
    assert(r(2L) == r(4L), r)
    // 2 and 4 are dangling (no out-edges): present, their mass dropped
    assert(r.contains(2L) && r.contains(4L) && r.size == 4)
  }

  test("hub pages accumulate rank on the fixture graph; deterministic") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"))
    val n = docs.count()
    def edges(d: org.apache.spark.sql.DataFrame) = d
      .select(col("doc_id").as("src"), ((col("doc_id") * 7 + 3) % n).as("dst"))
      .unionByName(d.select(col("doc_id").as("src"),
        (col("doc_id") % 10).as("dst")))
    val r = LinkRank.pageRank(edges(docs), "src", "dst", 6).cache()
    assert(r.count() == n)
    // every hub (node < 10) outranks every non-hub
    val minHub = r.filter(col("node") < 10)
      .agg(min("rank_micro")).head().getLong(0)
    val maxOther = r.filter(col("node") >= 10)
      .agg(max("rank_micro")).head().getLong(0)
    assert(minHub > maxOther, s"hubs $minHub must outrank others $maxOther")
    // bit-identical under repartitioning
    val b = LinkRank.pageRank(edges(docs.repartition(7)), "src", "dst", 6)
      .withColumnRenamed("rank_micro", "r2")
    assert(r.join(b, "node").filter(col("rank_micro") =!= col("r2"))
      .count() == 0)
    r.unpersist()
  }
}
