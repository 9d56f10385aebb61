package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.Barriers.FirewallOps

/** Link-graph centrality for crawl quality weighting — the signal real
  * web-scale corpus pipelines read before sampling (Common Crawl
  * publishes per-host centrality ranks; seed-quality weighting in
  * OpenWebText-style corpora is the same idea): pages endorsed by many
  * well-endorsed pages are likelier to be worth their tokens.
  *
  * PageRank (Page et al. 1999) by fixed-iteration power method in
  * EXACT fixed-point arithmetic: ranks are micro-unit longs (scale
  * 1e6 per node), every step is integer multiply / floor-divide / sum
  * — order-independent and bit-identical across engines and
  * partitionings, the [[graft.text.TextOps.bm25Rank]] discipline. Per
  * iteration, with damping d = dampingPct/100:
  *
  *   r'(v) = (1-d) * 1e6  +  d * Σ_{u -> v} floor(r(u) / outdeg(u))
  *
  * (floor at the contribution, then one floor after the damping
  * multiply — the pinned evaluation order). Dangling-node mass (pages
  * with no out-links) is dropped, the standard simplification; ranks
  * then sum to slightly under |V| * 1e6, which is irrelevant for the
  * ORDERING a sampler consumes. Multi-edges count multiply (a page
  * linking twice endorses twice); callers wanting simple-graph
  * semantics `.distinct()` the edge frame first.
  */
object LinkRank {

  /** Returns (node, rank_micro) over the union of source and target
    * node ids after `iterations` power steps.
    *
    * Scale shape: the canonical two-shuffles-per-iteration PageRank —
    * contributions shuffle on the SOURCE key (join ranks + out-degree
    * to edges), the new ranks aggregate on the TARGET key (map-side
    * combinable long sum). The edge projection and out-degree table
    * are barrier-cached once and reused by every iteration (the scan
    * is the dominant repeated cost at 100 TB), and each iteration's
    * rank frame is localCheckpoint'd so plan depth stays O(1) per
    * step instead of O(iterations) joins deep. Skewed in-degree (every
    * crawl has a google.com) lands in the TARGET aggregation — a hash
    * aggregate with partial combine, not a window, so a hot page never
    * serializes a task. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, dampingPct: Int = 85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0, 100], got $dampingPct")
    // barrierFirewall, not a plain cache: every iteration joins `e`
    // against `out` (an aggregate OVER e) — exactly the self-join
    // shape whose analyzer dedup rewrite silently misses a lazy cache
    // entry (the r14 kernel lesson); the firewall re-roots both at
    // their materialized leaves so the edge scan runs ONCE, not once
    // per iteration side
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).barrierFirewall()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val out = e.groupBy("src").agg(count(lit(1)).as("od")).barrierFirewall()
    val base = (100 - dampingPct) * 10000L // (1-d) * 1e6
    var r = nodes.withColumn("rank_micro", lit(1000000L))
    var i = 0
    while (i < iterations) {
      val contrib = e
        .join(r.select(col("node").as("src"), col("rank_micro")), "src")
        .join(out, "src")
        .select(col("dst").as("node"),
          expr("rank_micro div od").as("__c"))
      val sums = contrib.groupBy("node").agg(sum("__c").as("__s"))
      r = nodes.join(sums, Seq("node"), "left")
        .select(col("node"),
          (lit(base) +
            expr(s"$dampingPct * coalesce(__s, 0L) div 100"))
            .as("rank_micro"))
        .localCheckpoint()
      i += 1
    }
    r
  }
}
