package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sim.Similarity
import graft.text.TextOps

/** Scale-step evidence for the round-5 operators: runs
  * [[TextOps.segmentDedup]] over replicated document corpora and the
  * PQ encode + ADC search pair over replicated embedding corpora at
  * multiples of the sf0.1 row counts, reporting wall time and total
  * shuffle bytes per step (same listener-drain discipline as
  * [[CurateScale]]).
  *
  * Document copies are duplicate-heavy by construction: the per-copy
  * suffix touches only the LAST segment (it contains no separator), so
  * a variant copy still shares all but one segment verbatim with its
  * base doc, and 10% of copies are byte-identical — near-worst-case
  * input for segment dedup, since almost every exploded segment is a
  * repeat the min-struct aggregate must collapse. Embedding copies
  * perturb one dimension per copy so the PQ codebook sees distinct but
  * clustered vectors.
  *
  * Usage: runMain graft.tools.DedupScale [sfDir] [copies...]
  */
object DedupScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 3, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    object metrics extends SparkListener {
      @volatile var shuffleWrite = 0L
      @volatile var shuffleRead = 0L
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        shuffleWrite += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        shuffleRead += sc.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
      }
      def reset(): Unit = { shuffleWrite = 0L; shuffleRead = 0L }
    }
    spark.sparkContext.addSparkListener(metrics)

    def drain(): Unit =
      org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(spark.sparkContext)

    // optional comma-separated label filter: measure only matching ops
    // (iteration aid; the recorded BASELINE runs use the full set)
    val opFilter = sys.env.get("SPARK_GRAFT_SCALE_OPS")
      .map(_.split(',').toSet)
    def measure(label: String, n: Long)(job: => Long): Unit = {
      if (opFilter.exists(f => !f.contains(label))) return
      drain(); metrics.reset()
      val t0 = System.nanoTime()
      val out = job
      val sec = (System.nanoTime() - t0) / 1e9
      drain()
      println(f"DEDUP_SCALE op=$label%-12s rows=$n%8d out=$out%8d wall=$sec%8.2f s " +
        f"shuffle_write=${metrics.shuffleWrite / 1e6}%9.1f MB " +
        f"shuffle_read=${metrics.shuffleRead / 1e6}%9.1f MB")
    }

    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").localCheckpoint()
    val emb0 = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").localCheckpoint()

    def scaledDocs(k: Int): DataFrame =
      (0 until k).map { c =>
        if (c == 0) docs0
        else docs0.select(
          (col("doc_id") + lit(c.toLong * 1000000L)).as("doc_id"),
          when(col("doc_id") % 10 === 0, col("text"))
            .otherwise(concat(col("text"), lit(s" segvariant$c"))).as("text"))
      }.reduce(_ unionByName _)

    def scaledEmb(k: Int): DataFrame =
      (0 until k).map { c =>
        if (c == 0) emb0
        else emb0.select(
          (col("vec_id") + lit(c.toLong * 1000000L)).as("vec_id"),
          transform(col("embedding"),
            (x, i) => when(i === 0, x + lit(c * 0.01f)).otherwise(x))
            .as("embedding"))
      }.reduce(_ unionByName _)

    // Deliberately cell-skewed corpus for the semDedup |cell|^2 worst
    // case: every EVEN vec_id collapses onto one tight synthetic
    // cluster (dim 0 ~ 0.9 + a tiny id-dependent offset, the rest a
    // constant 0.1), so k-means with an even seed ends up with ONE cell
    // holding ~50% of all rows — the adversarial distribution the
    // cluster-keyed self-join is worst at.
    def skewedEmb(k: Int): DataFrame =
      scaledEmb(k).select(col("vec_id"),
        when(col("vec_id") % 2 === 0,
          transform(col("embedding"), (x, i) =>
            when(i === 0,
              (pmod(col("vec_id"), lit(997L)).cast("double") * 1e-6 + 0.9)
                .cast("float"))
              .otherwise(lit(0.1f))))
          .otherwise(col("embedding")).as("embedding"))

    // warm pass: JIT/codegen for all tracks before anything is timed
    TextOps.segmentDedup(docs0, "doc_id", "text", sep = " the ").count()
    locally {
      val cb = Similarity.pqCodebook(emb0.filter(col("vec_id") < 16),
        "vec_id", "embedding", m = 4, subDim = 16)
      val codes = Similarity.pqEncode(emb0, cb, "vec_id", "embedding", 4, 16)
      Similarity.pqAdcSearch(codes, cb,
        emb0.filter(col("vec_id") >= 16 && col("vec_id") < 19),
        "vec_id", "embedding", 4, 16, k = 5).count()
      Similarity.semDedup(emb0, "vec_id", "embedding",
        Seq(0L, 1L, 2L, 3L), 2, 0.3).count()
      TextOps.leakSafeSplit(docs0, "doc_id", "text", testFrac = 0.2).count()
      TextOps.temperatureSample(docs0.withColumn("source",
          concat(lit("s"), pmod(col("doc_id"), lit(7L)))),
        "doc_id", "source", alpha = 0.5).count()
      Similarity.cellBalancedSample(emb0, "vec_id", "embedding",
        initIds = Seq(0L, 1L, 2L, 3L), iterations = 2, perCell = 100).count()
      // round-9 tracks
      TextOps.hllRegisters(docs0.withColumn("source", lit("s")), "source",
        explode(TextOps.tokens(col("text")))).count()
      TextOps.cmsRegisters(
        docs0.select(explode(TextOps.tokens(col("text"))).as("t")),
        col("t")).count()
      TextOps.corpusStats(docs0.withColumn("source", lit("s")),
        "doc_id", "text", "source").count()
      graft.ops.Layout.zorderCells(
        docs0.select(col("doc_id"), length(col("text")).as("len")),
        "doc_id", "len").count()
      TextOps.dedupParagraphs(docs0.withColumn("text",
        regexp_replace(col("text"), " the ", "\n\n")), "doc_id", "text").count()
      graft.text.PiiOps.redactPii(docs0, "doc_id", "text").count()
      locally {
        val cents = emb0.filter(col("vec_id") < 4)
        val indexed = Similarity.ivfAssign(emb0, cents, "vec_id", "embedding")
        val res = Similarity.ivfResiduals(indexed, cents, "vec_id", "embedding")
        val rcb = Similarity.pqCodebook(res.filter(col("vec_id") < 16)
          .select(col("vec_id"), col("res")), "vec_id", "res", 4, 16)
        Similarity.ivfPqEncode(res, rcb, "vec_id", 4, 16).count()
        Similarity.embeddingOutliers(emb0, cents, "vec_id", "embedding").count()
      }
    }

    copies.foreach { k =>
      val docs = scaledDocs(k).localCheckpoint()
      val nD = docs.count()
      measure("segdedup", nD) {
        TextOps.segmentDedup(docs, "doc_id", "text", sep = " the ").count()
      }
      val emb = scaledEmb(k).localCheckpoint()
      val nE = emb.count()
      val cb = Similarity.pqCodebook(emb.filter(col("vec_id") < 16),
        "vec_id", "embedding", m = 4, subDim = 16)
      measure("pq_encode", nE) {
        Similarity.pqEncode(emb, cb, "vec_id", "embedding", 4, 16).count()
      }
      // localCheckpoint is EAGER: the encode runs here, outside the
      // timed region, so the pq_adc row measures the ADC scan alone
      // over pre-materialized codes (the deployment shape — codes are
      // written once, scanned per query batch). Encode cost is its own
      // row above.
      val codes = Similarity.pqEncode(emb, cb, "vec_id", "embedding", 4, 16)
        .localCheckpoint()
      measure("pq_adc", nE) {
        Similarity.pqAdcSearch(codes, cb,
          emb.filter(col("vec_id") >= 16 && col("vec_id") < 19),
          "vec_id", "embedding", 4, 16, k = 5).count()
      }
      // SQ8 tier: per-dim bounds + narrow encode, then the
      // reconstruct-and-score scan over int8 codes (same
      // pre-materialized-codes shape as pq_adc)
      val sqStats = Similarity.sqStats(emb, "embedding", 64).localCheckpoint()
      measure("sq_encode", nE) {
        Similarity.sqEncode(emb, "vec_id", "embedding", 64).count()
      }
      val sqCodes = Similarity.sqEncode(emb, "vec_id", "embedding", 64)
        .localCheckpoint()
      measure("sq_search", nE) {
        Similarity.sqSearch(sqCodes, sqStats,
          emb.filter(col("vec_id") >= 16 && col("vec_id") < 19),
          "vec_id", "embedding", k = 5).count()
      }
      // SemDeDup DEFAULT path (cap 500 since r8): balanced cells
      // (near-random embeddings -> ~n/k per cell) vs the adversarial
      // one-hot-cell distribution; with the guard on by default both
      // rows should now grow ~linearly.
      measure("semdedup_bal", nE) {
        Similarity.semDedup(emb, "vec_id", "embedding",
          Seq(0L, 1L, 2L, 3L), 2, 0.3).count()
      }
      val skew = skewedEmb(k).localCheckpoint()
      val nS = skew.count()
      measure("semdedup_skew", nS) {
        Similarity.semDedup(skew, "vec_id", "embedding",
          Seq(0L, 1L, 3L, 5L), 2, 0.3).count()
      }
      // the explicit OPT-OUT (maxCellSize = 0): the raw |cell|^2
      // self-join on the adversarial input — the wall gap vs the
      // capped semdedup_skew row above is the measured value of the
      // default guard.
      measure("semdedup_skew_raw", nS) {
        Similarity.semDedup(skew, "vec_id", "embedding",
          Seq(0L, 1L, 3L, 5L), 2, 0.3, maxCellSize = 0).count()
      }
      // Round-8 operators. leakSafeSplit inherits the full MinHash/LSH/
      // CC chain on a duplicate-heavy corpus (every non-10th copy is a
      // one-token variant of its base doc, so the candidate-pair join
      // sees k x the true-dup volume — the bound that must stay
      // candidate-proportional). The sampling pair are expected to be
      // near-free: one |sources|-row agg + a narrow explode
      // (temperature), one k-means fit + prefiltered rank (cell-bal).
      measure("leak_split", nD) {
        TextOps.leakSafeSplit(docs, "doc_id", "text", testFrac = 0.2).count()
      }
      val srcDocs = docs.withColumn("source",
        concat(lit("s"), pmod(col("doc_id"), lit(7L)))).localCheckpoint()
      measure("temp_sample", nD) {
        TextOps.temperatureSample(srcDocs, "doc_id", "source",
          alpha = 0.5).count()
      }
      measure("cell_bal", nE) {
        Similarity.cellBalancedSample(emb, "vec_id", "embedding",
          initIds = Seq(0L, 1L, 2L, 3L), iterations = 2,
          perCell = 100).count()
      }
      // Round-9 operators. Paragraph dedup mirrors segdedup's shape
      // (one min-struct hash agg + join back — growth must track the
      // paragraph count); PII redaction is a pure narrow regexp map
      // (expected ~flat shuffle, wall ∝ bytes); perplexity buckets are
      // lmScore's aggs + a |sources|-row percentile; the IVF-PQ pair
      // adds only the residual projection to the PQ rows' shape; the
      // outlier flag is a |cells|-row stats agg + narrow compare.
      val pdocs = docs.withColumn("text",
        regexp_replace(col("text"), " the ", "\n\n")).localCheckpoint()
      measure("para_dedup", nD) {
        TextOps.dedupParagraphs(pdocs, "doc_id", "text").count()
      }
      measure("pii_redact", nD) {
        graft.text.PiiOps.redactPii(docs, "doc_id", "text").count()
      }
      measure("ppl_buckets", nD) {
        TextOps.perplexityBuckets(docs.filter(col("doc_id") % 4 === 0),
          srcDocs.filter(col("doc_id") % 4 =!= 0),
          "doc_id", "text", "source").count()
      }
      val icents = emb.filter(col("vec_id") < 4)
      val res = Similarity.ivfResiduals(
        Similarity.ivfAssign(emb, icents, "vec_id", "embedding"),
        icents, "vec_id", "embedding").localCheckpoint()
      val rcb = Similarity.pqCodebook(res.filter(col("vec_id") < 16)
        .select(col("vec_id"), col("res")), "vec_id", "res", 4, 16)
      measure("ivfpq_encode", nE) {
        Similarity.ivfPqEncode(res, rcb, "vec_id", 4, 16).count()
      }
      val ivfCodes = Similarity.ivfPqEncode(res, rcb, "vec_id", 4, 16)
        .localCheckpoint()
      measure("ivfpq_adc", nE) {
        Similarity.ivfPqSearch(ivfCodes, icents, rcb,
          emb.filter(col("vec_id") >= 16 && col("vec_id") < 19),
          "vec_id", "embedding", 4, 16, k = 5, nProbe = 2).count()
      }
      measure("emb_outliers", nE) {
        Similarity.embeddingOutliers(emb, icents, "vec_id", "embedding").count()
      }
      // Late-round-9 operators. The two sketches must show BOUNDED
      // output (registers ∝ sketch shape, not rows) with wall ∝ the
      // token stream; the data card is one rollup agg (wall ∝ bytes,
      // tiny shuffle); zorder is a hash-sampled percentile pair + a
      // narrow interleave (flat shuffle — the write-time range
      // partition is the caller's one placement shuffle, not timed
      // here).
      measure("hll_registers", nD) {
        TextOps.hllRegisters(srcDocs, "source",
          explode(TextOps.tokens(col("text")))).count()
      }
      measure("cms_registers", nD) {
        TextOps.cmsRegisters(
          docs.select(explode(TextOps.tokens(col("text"))).as("t")),
          col("t")).count()
      }
      measure("data_card", nD) {
        TextOps.corpusStats(srcDocs, "doc_id", "text", "source").count()
      }
      measure("zorder_cells", nD) {
        graft.ops.Layout.zorderCells(
          docs.select(col("doc_id"), length(col("text")).as("len")),
          "doc_id", "len", bits = 8).count()
      }
      measure("hist_registers", nD) {
        TextOps.histRegisters(srcDocs, "source",
          length(col("text"))).count()
      }
      measure("emb_moments", nE) {
        Similarity.embMoments(emb, "vec_id", "embedding").count()
      }
      measure("token_drift", nD) {
        TextOps.tokenDrift(srcDocs, "doc_id", "text", "source").count()
      }
      // Round-10 operators: the crawl tier (all narrow — wall should
      // track bytes with ~0 shuffle), the budget sampler (prefilter +
      // one bounded window shuffle) and sentence segmentation.
      measure("html_extract", nD) {
        val html = docs.select(col("doc_id"),
          concat(lit("<html><head><script>var x = 1 < 2;</script>" +
            "<style>p{}</style></head><body><h1>T</h1><p>"),
            col("text"),
            lit(" &amp; tail</p><div>b</div></body></html>")).as("h"))
        graft.text.HtmlOps.extractText(html, "doc_id", "h").count()
      }
      measure("warc_to_corpus", nD) {
        graft.sources.Warc.toCorpus(
          graft.sources.Warc.buildWarc(docs, "doc_id", "text"),
          "warc_id", "payload").count()
      }
      measure("sentence_split", nD) {
        TextOps.sentenceSplit(docs.select(col("doc_id"),
          concat(col("text"), lit(". End part! Tail?")).as("t")),
          "doc_id", "t").count()
      }
      measure("token_budget", nD) {
        TextOps.tokenBudgetSample(srcDocs, "doc_id", "text", "source",
          budgetTokens = 5000).count()
      }
    }
    spark.stop()
  }
}
