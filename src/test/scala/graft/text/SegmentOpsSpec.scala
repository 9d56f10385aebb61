package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Segment-granularity ops: CCNet-style paragraph dedup, C4-style line
  * filtering, tf-idf keywords. */
class SegmentOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("segmentDedup keeps the corpus-wide first occurrence of each segment") {
    val docs = Seq(
      (1L, "alpha\n\nbeta"),
      (2L, "beta\n\ngamma"),     // beta already seen in doc 1
      (3L, "   \n\nalpha")       // blank + dup -> doc vanishes
    ).toDF("doc_id", "text")
    val out = TextOps.segmentDedup(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "alpha\n\nbeta", 2L, 2L),
      (2L, "gamma", 2L, 1L)))
  }

  test("segmentDedup dedups within a single document by position") {
    val docs = Seq((7L, "x\n\nx\n\ny")).toDF("doc_id", "text")
    val out = TextOps.segmentDedup(docs, "doc_id", "text").collect()
    assert(out.length == 1)
    assert(out(0).getString(1) == "x\n\ny")
    assert(out(0).getLong(2) == 3L && out(0).getLong(3) == 2L)
  }

  test("lineFilter applies word-count, banned-substring, and terminal rules") {
    val docs = Seq(
      (1L, "This is a good line.\nshort one\nwith some JAVASCRIPT code here.\nAnother fine line here!"),
      (2L, "only one decent line survives here.\ntiny")
    ).toDF("doc_id", "text")
    val out = TextOps.lineFilter(docs, "doc_id", "text", sep = "\n",
        minWords = 4, banned = Seq("javascript"), requireTerminal = true,
        minKeptLines = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // doc 1: line 2 too short, line 3 banned (case-insensitive) -> 2 kept
    // doc 2: 1 kept < minKeptLines -> dropped
    assert(out.toSeq == Seq(
      (1L, "This is a good line.\nAnother fine line here!", 4L, 2L)))
  }

  test("lineFilter without requireTerminal keeps unpunctuated lines") {
    val docs = Seq((1L, "four words right here\nthree words only")).toDF("doc_id", "text")
    val out = TextOps.lineFilter(docs, "doc_id", "text", sep = "\n",
      minWords = 4, banned = Nil, requireTerminal = false, minKeptLines = 1)
    assert(out.collect()(0).getString(1) == "four words right here")
  }

  test("tfidf ranks document-specific terms above ubiquitous ones") {
    val docs = Seq(
      (1L, "common rare rare"),
      (2L, "common other"),
      (3L, "common other")
    ).toDF("doc_id", "text")
    val out = TextOps.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rnk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(4)))
    // 'common' appears in every doc -> idf = ln(1) = 0 -> ranked below
    // any positive-idf term; ties by term text
    assert(out.take(2).toSeq == Seq((1L, "rare", 1), (1L, "common", 2)))
    assert(out.filter(_._1 == 2L).head._2 == "other")
  }

  test("tfidf tie-break is on term text at equal score") {
    val docs = Seq((1L, "bb aa"), (2L, "cc dd")).toDF("doc_id", "text")
    val out = TextOps.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .filter(col("doc_id") === 1L).orderBy("rnk")
      .collect().map(_.getString(1))
    assert(out.toSeq == Seq("aa", "bb"))
  }

  test("mixtureUpsample: integer weights copy exactly, fractions sample deterministically") {
    val docs = (0L until 100L).map(i => (i, if (i < 50) "a" else "b"))
      .toDF("doc_id", "source")
    val out = TextOps.mixtureUpsample(docs, "doc_id", "source",
        Map("a" -> 2.0, "b" -> 0.4))
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    // source a (rate 2.0): every doc exactly copies 0 and 1
    val aCopies = out.filter(_._1 < 50).groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq)
    assert(aCopies.size == 50 && aCopies.values.forall(_ == Seq(0, 1)))
    // source b (rate 0.4 < 1): a deterministic ~40% subset, one copy each
    val bRows = out.filter(_._1 >= 50)
    assert(bRows.forall(_._2 == 0))
    assert(bRows.length > 10 && bRows.length < 30, s"got ${bRows.length} of 50")
    val again = TextOps.mixtureUpsample(docs, "doc_id", "source",
        Map("a" -> 2.0, "b" -> 0.4))
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(again.toSet == out.toSet, "deterministic across runs")
  }

  test("mixtureUpsample extra-copy hash is independent of mixtureSample's keep-hash") {
    // pre-filter at rate 0.5, then upsample 2.5x: with a SHARED hash every
    // survivor (u < 0.5) would get the extra copy (frac = 0.5); the salted
    // hash keeps the extra-copy fraction near frac(r) among survivors
    val docs = (0L until 400L).map(i => (i, "a")).toDF("doc_id", "source")
    val kept = TextOps.mixtureSample(docs, "doc_id", "source", Map("a" -> 0.5))
    val nKept = kept.count()
    val extra = TextOps.mixtureUpsample(kept, "doc_id", "source", Map("a" -> 2.5))
      .filter(col("copy") === 2).count()
    val frac = extra.toDouble / nKept
    assert(frac > 0.3 && frac < 0.7,
      s"extra-copy fraction $frac should be near 0.5, not 1.0 (shared-hash bias)")
  }

  test("bloomDecontaminate flags every exact overlap (no false negatives)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docs.filter(col("doc_id") >= 25)
    val bench = docs.filter(col("doc_id") < 25)
    val exact = TextOps.decontaminate(corpus, bench, "doc_id", "text",
      shingleWords = 3)
    val bloom = TextOps.bloomDecontaminate(corpus, bench, "doc_id", "text",
      shingleWords = 3, mBits = 65536L, kHashes = 4)
    assert(exact.count() > 0, "fixture must produce exact overlaps")
    // Bloom superset property: every exactly-overlapping doc is flagged,
    // and its hit count is at least the exact overlap count
    val joined = exact.select(col("doc_id"), col("n_overlap"))
      .join(bloom.select(col("doc_id"), col("n_hit")), Seq("doc_id"), "left")
    assert(joined.filter(col("n_hit").isNull).count() == 0)
    assert(joined.filter(col("n_hit") < col("n_overlap")).count() == 0)
  }

  test("bloomDecontaminate with a tiny filter flags everything (saturation)") {
    val docs = Seq((1L, "aa bb cc dd"), (2L, "zz yy xx ww")).toDF("doc_id", "text")
    val bench = Seq((9L, "qq rr ss tt")).toDF("doc_id", "text")
    // mBits=1: every position is 0, the one set bit matches every probe
    val out = TextOps.bloomDecontaminate(docs, bench, "doc_id", "text",
      shingleWords = 3, mBits = 1L, kHashes = 2)
    assert(out.count() == 2, "fully-saturated filter flags all docs")
  }

  test("shardAssign is deterministic with contiguous per-shard sequences") {
    val docs = (0L until 64L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    def run() = TextOps.shardAssign(docs, "doc_id", nShards = 4)
      .select("doc_id", "shard", "seq")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val a = run()
    assert(run() == a, "content-independent hash -> identical across runs")
    assert(a.map(_._2).subsetOf((0 until 4).toSet))
    // each shard's seq is exactly 1..|shard|
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3) == (1L to rows.size).toSet)
    }
    assert(a.size == 64)
  }

  test("removeBoilerplateSegments kills every copy above the frequency threshold") {
    // group "a": NAV in 4/4 docs (removed), PROMO in 2/4 = 0.5 (removed),
    // each doc one unique segment (kept). Doc 4 is all-boilerplate.
    val docs = Seq(
      (1L, "a", "NAV\n\nPROMO\n\nunique one"),
      (2L, "a", "NAV\n\nPROMO\n\nunique two"),
      (3L, "a", "NAV\n\nunique three"),
      (4L, "a", "NAV"),
      // group "b" has its own threshold base (2 docs, not 6)
      (5L, "b", "SHARED\n\nfive"),
      (6L, "b", "SHARED\n\nsix")
    ).toDF("doc_id", "source", "text")
    val out = TextOps.removeBoilerplateSegments(docs, "doc_id", "source",
        "text", maxDocFrac = 0.3, minDocFreq = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(out.toSeq == Seq(
      (1L, 3L, 1L, "unique one"),              // NAV 4/4, PROMO 2/4 gone
      (2L, 3L, 1L, "unique two"),
      (3L, 2L, 1L, "unique three"),
      (4L, 1L, 0L, ""),                        // all boilerplate -> empty
      (5L, 2L, 1L, "five"),                    // SHARED 2/2 in group b
      (6L, 2L, 1L, "six")))
  }

  test("removeBoilerplateSegments minDocFreq floor protects tiny groups") {
    val docs = Seq(
      (5L, "b", "SHARED\n\nfive"),
      (6L, "b", "SHARED\n\nsix")
    ).toDF("doc_id", "source", "text")
    val out = TextOps.removeBoilerplateSegments(docs, "doc_id", "source",
        "text", maxDocFrac = 0.3, minDocFreq = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getString(4)))
    // df=2 < minDocFreq=3: the 100%-frequency pair still survives
    assert(out.toSeq == Seq(
      (5L, 2L, "SHARED\n\nfive"),
      (6L, 2L, "SHARED\n\nsix")))
  }

  test("removeBoilerplateSegments counts DOCUMENT frequency, not occurrences") {
    // the repeated-within-one-doc segment has df=1: within-doc repeats
    // must not push it over the threshold
    val docs = Seq(
      (1L, "a", "echo\n\necho\n\necho\n\nbody"),
      (2L, "a", "other"), (3L, "a", "more"), (4L, "a", "text")
    ).toDF("doc_id", "source", "text")
    val out = TextOps.removeBoilerplateSegments(docs, "doc_id", "source",
        "text", maxDocFrac = 0.3, minDocFreq = 2)
      .filter(col("doc_id") === 1L).collect()(0)
    assert(out.getLong(3) == 4L, "df=1 segment survives all its copies")
  }

  test("mixtureAllocate water-fills: saturated supply re-flows by weight") {
    def src(name: String, n: Int) = (name, Seq.fill(n)("tok").mkString(" "))
    val docs = Seq(src("A", 100), src("B", 10000), src("C", 10000))
      .toDF("source", "text")
    val w = when(col("source") === "C", 2.0).otherwise(1.0)
    val out = TextOps.mixtureAllocate(docs, "source", "text", w,
        budgetTokens = 8100L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getBoolean(3), r.getLong(4), r.getDouble(5))).toMap
    // A: ratio 100 vs first water level 8100/4 = 2025 -> saturated, all in
    assert(out("A") == ((100L, true, 100L, 1.0)))
    // remaining 8000 splits 1:2 over B:C, levels 6-dp rounded
    assert(out("B") == ((10000L, false, 2667L, 0.2667)))
    assert(out("C") == ((10000L, false, 5333L, 0.5333)))
  }

  test("mixtureAllocate saturates everything when the budget exceeds supply") {
    val docs = Seq(("A", "a b c"), ("B", "d e")).toDF("source", "text")
    val out = TextOps.mixtureAllocate(docs, "source", "text", lit(1.0),
        budgetTokens = 1000L)
      .collect().map(r => (r.getString(0), r.getBoolean(3), r.getLong(4),
        r.getDouble(5)))
    assert(out.toSet == Set(("A", true, 3L, 1.0), ("B", true, 2L, 1.0)))
  }

  test("mixtureAllocate drops non-positive-weight sources") {
    val docs = Seq(("A", "a b"), ("Z", "c d")).toDF("source", "text")
    val w = when(col("source") === "Z", 0.0).otherwise(1.0)
    val out = TextOps.mixtureAllocate(docs, "source", "text", w, 2L)
    assert(out.select("source").as[String].collect().toSeq == Seq("A"))
  }
}
