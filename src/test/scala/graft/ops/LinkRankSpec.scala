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

  test("dangling redistribution conserves total mass within the " +
      "floor-truncation bound") {
    // 1 -> 2, 3 -> 2: node 2 is dangling and hoards inbound mass.
    // Without redistribution total mass leaks every step; with it the
    // only losses are the floors: <= 1 micro per edge (contribution
    // div), 1 per node (damping div), plus <= |V| micro total for
    // floor(M/|V|) and 1 more per node for its damping — bound per
    // step: |E| + 2|V| + |V| micros.
    val edges = Seq(1L -> 2L, 3L -> 2L)
    val nV = 3L
    val full = nV * 1000000L
    val bound = (edges.size + 3 * nV) * 1L
    var prevTotal = full
    (1 to 4).foreach { iters =>
      val r = LinkRank.pageRank(edges.toDF("src", "dst"), "src", "dst",
        iters, redistributeDangling = true)
        .collect().map(_.getLong(1)).sum
      assert(r <= full && r >= prevTotal - bound,
        s"iters=$iters total $r outside [$prevTotal - $bound, $full]")
      prevTotal = r
    }
    // the default (drop) loses the dangling mass: strictly less total
    val dropped = LinkRank.pageRank(edges.toDF("src", "dst"), "src",
      "dst", 2).collect().map(_.getLong(1)).sum
    assert(dropped < prevTotal)
  }

  test("dangling redistribution: hand-computed first step") {
    // 1 -> 2 only. |V| = 2, M_0 = r(2) = 1e6, per-node share
    // floor(1e6/2) = 500000, damped: 85 * 500000 div 100 = 425000.
    // r1(2) = 150000 + 850000 (inbound) + 425000 = 1425000
    // r1(1) = 150000 + 0 + 425000 = 575000
    val r = LinkRank.pageRank(Seq(1L -> 2L).toDF("src", "dst"), "src",
        "dst", 1, redistributeDangling = true)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 575000L, 2L -> 1425000L), r)
  }

  test("convergence-delta stop matches the fixed-point result and " +
      "fires before the cap") {
    // 2-cycle is an exact fixed point after 0 steps: with any delta
    // >= 0 the stop fires on iteration 1 and the result equals the
    // 50-iteration run bit-for-bit
    val edges = Seq(1L -> 2L, 2L -> 1L)
    val capped = LinkRank.pageRank(edges.toDF("src", "dst"), "src",
        "dst", 50).collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val t0 = System.nanoTime()
    val early = LinkRank.pageRank(edges.toDF("src", "dst"), "src",
        "dst", 50, convergeDeltaMicro = Some(0L))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val earlyWall = System.nanoTime() - t0
    assert(early == capped)
    // the star graph reaches its fixed point by iteration 2; a
    // delta-stopped 50-cap run must agree with the exact 3-iteration
    // ranks (the stop can only fire AT the fixed point)
    val star = (1L to 4L).map(_ -> 10L)
    val fixed = LinkRank.pageRank(star.toDF("src", "dst"), "src",
        "dst", 3).collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val stopped = LinkRank.pageRank(star.toDF("src", "dst"), "src",
        "dst", 50, convergeDeltaMicro = Some(0L))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(stopped == fixed)
    assert(earlyWall > 0) // wall observed; early-exit is the contract
  }

  test("redistributeDangling on an empty edge frame fails loudly " +
      "instead of silently NULLing every rank (|V|=0 division)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      LinkRank.pageRank(empty, "src", "dst", 3,
        redistributeDangling = true)
    }
    assert(e.getMessage.contains("no vertices"))
    // without redistribution an empty frame stays legal (empty result)
    assert(LinkRank.pageRank(empty, "src", "dst", 3).count() == 0)
  }

  private def triMap(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val df = edges.toDF("src", "dst")
    LinkRank.triangleCounts(df, "src", "dst").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  }

  test("triangleCounts: K4, a dangling path, an isolated edge; " +
      "self-loops, multi-edges and reversed duplicates collapse") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val noise = Seq((0L, 0L), (1L, 0L), (2L, 1L)) // self-loop + reversals
    val path = Seq((4L, 5L), (5L, 6L))            // wedge, no triangle
    val iso = Seq((7L, 8L))
    val got = triMap(k4 ++ noise ++ path ++ iso)
    // K4: every vertex degree 3, sits in C(3,2)=3 triangles
    (0L to 3L).foreach { v =>
      val (d, t) = (got(v)._1, got(v)._2)
      assert((d, t) == ((3L, 3L)), s"K4 vertex $v: degree $d, tri $t")
    }
    assert(got(5L) == ((2L, 0L)), "path center: wedge but no triangle")
    assert(got(7L) == ((1L, 0L)) && got(8L) == ((1L, 0L)))
    assert(!got.contains(9L) && got.size == 9)
  }

  test("triangleCounts: star hub + open ring — the hub's in-degree " +
      "never wedge-explodes, counts are exact") {
    val m = 100L
    val star = (1L to m).map(i => (0L, i))
    val ring = (1L until m).map(i => (i, i + 1))
    val got = triMap(star ++ ring)
    assert(got(0L) == ((m, m - 1)), "hub: degree 100, one triangle per ring edge")
    assert(got(1L) == ((2L, 1L)) && got(m) == ((2L, 1L)))
    (2L until m).foreach(i => assert(got(i) == ((3L, 2L)), s"spoke $i"))
  }

  test("triangleCounts agrees with a driver-side brute force on a " +
      "deterministic pseudo-random graph") {
    val n = 60L
    val edges = (0L until 200L).map(i =>
      ((i * 7919) % n, (i * 104729 + 13) % n))
    val got = triMap(edges)
    // brute force: adjacency sets over the normalized simple graph
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    val adj = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = adj.map { case (v, nb) =>
      val t = nb.toSeq.combinations(2)
        .count { case Seq(x, y) => adj(x).contains(y) }
      v -> ((nb.size.toLong, t.toLong))
    }
    assert(got == want)
  }
}
