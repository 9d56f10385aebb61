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

  test("lshCandidatePairs: all pairs under the cap, star edges above it, linear volume") {
    import spark.implicits._
    // bucket A: 3 members (small) -> C(3,2)=3 pairs; bucket B: 5 members
    // with cap 4 (hot) -> 4 star edges to the min id; bucket C shares a
    // member pair with A -> distinct must collapse the duplicate
    val bux = Seq(
      (1L, "A"), (2L, "A"), (3L, "A"),
      (10L, "B"), (11L, "B"), (12L, "B"), (13L, "B"), (14L, "B"),
      (1L, "C"), (2L, "C")).toDF("doc_id", "bucket")
    val got = TextOps.lshCandidatePairs(bux, "doc_id", hotBucketCap = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set(
      (1L, 2L), (1L, 3L), (2L, 3L),                        // A all-pairs (C dup collapsed)
      (10L, 11L), (10L, 12L), (10L, 13L), (10L, 14L)))     // B star to min
    // opt-out reproduces exact all-pairs
    val raw = TextOps.lshCandidatePairs(bux, "doc_id", hotBucketCap = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(raw == got ++ Set((11L, 12L), (11L, 13L), (11L, 14L),
      (12L, 13L), (12L, 14L), (13L, 14L)))
    // a hot bucket stays one connected component through CC
    val cc = TextOps.nearDupClusters(
        TextOps.lshCandidatePairs(bux, "doc_id", hotBucketCap = 4)
          .filter($"a_id" >= 10L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 14L -> 10L))
  }

  test("lshCandidatePairs capped kernel is id-type agnostic") {
    import spark.implicits._
    // the window kernel must emit the same pair set for int and long ids
    val buxInt = Seq(
      (1, "A"), (2, "A"), (3, "A"),
      (10, "B"), (11, "B"), (12, "B"), (13, "B"), (14, "B"),
      (1, "C"), (2, "C")).toDF("doc_id", "bucket")
    val generic = TextOps.lshCandidatePairs(buxInt, "doc_id", hotBucketCap = 4)
      .collect().map(r => (r.getInt(0).toLong, r.getInt(1).toLong)).toSet
    val fast = TextOps.lshCandidatePairs(
        buxInt.withColumn("doc_id", $"doc_id".cast("long")),
        "doc_id", hotBucketCap = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(generic == fast)
    assert(generic.nonEmpty)
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
    // maxLocalEdges = 0 forces the distributed pointer-jumping path
    val chain = (1L until 40L).map(i => (i, i + 1))
    val c = TextOps.nearDupClusters(pairs(chain: _*), maxIters = 20, maxLocalEdges = 0)
    assert(c.filter(org.apache.spark.sql.functions.col("cluster") =!= 1L).count() == 0)
  }

  test("nearDupClusters local union-find agrees with the distributed path") {
    val rng = new scala.util.Random(7)
    val es = Seq.fill(200)((rng.nextInt(80).toLong, rng.nextInt(80).toLong))
      .filter(p => p._1 != p._2)
    val df = pairs(es: _*)
    def toMap(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = toMap(TextOps.nearDupClusters(df))
    val dist = toMap(TextOps.nearDupClusters(df, maxLocalEdges = 0))
    assert(local == dist)
  }

  test("nearDupClusters local path handles string ids") {
    val schema = StructType(Seq(
      StructField("a_id", StringType), StructField("b_id", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row("d2", "d3"), Row("d3", "d9"), Row("x1", "x2")), 2), schema)
    val c = TextOps.nearDupClusters(df)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(c == Map("d2" -> "d2", "d3" -> "d2", "d9" -> "d2",
      "x1" -> "x1", "x2" -> "x1"))
  }

  test("packSequences fills bins contiguously per source") {
    import spark.implicits._
    // source A: 300+300+200+512 tokens -> cum 300,600,800,1312
    // bins (budget 512): floor(0/512)=0, floor(300/512)=0, 600->1, 800->1
    val docs = Seq(
      (1L, "A", Seq.fill(300)("w").mkString(" ")),
      (2L, "A", Seq.fill(300)("w").mkString(" ")),
      (3L, "A", Seq.fill(200)("w").mkString(" ")),
      (4L, "A", Seq.fill(512)("w").mkString(" ")),
      (5L, "B", Seq.fill(600)("w").mkString(" "))
    ).toDF("doc_id", "source", "text")
    val bins = TextOps.packSequences(docs, "doc_id", "text", "source", 512)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(bins == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 0L))
  }

  test("packSequencesAtomic: BFD beats next-fit and respects capacity") {
    import spark.implicits._
    // one source, nShards = 1 so the whole group packs together; lengths
    // 60,60,60,40,40,40 with budget 100: next-fit in id order burns 4
    // bins (60 | 60 | 60+40 | 40+40); BFD (60+40)x3 hits the LP bound of 3
    val docs = Seq(60, 60, 60, 40, 40, 40).zipWithIndex.map { case (n, i) =>
      (i.toLong, "A", Seq.fill(n)("w").mkString(" "))
    }.toDF("doc_id", "source", "text")
    def pack(strategy: String) =
      TextOps.packSequencesAtomic(docs, "doc_id", "text", "source",
          budget = 100, nShards = 1, strategy = strategy)
        .collect().map(r => r.getLong(2) -> r.getLong(4)).toMap
    val nf = pack("nextfit")
    assert(nf.values.toSet.size == 4, s"next-fit must burn 4 bins: $nf")
    val bf = pack("bfd")
    assert(bf.values.toSet.size == 3, s"BFD must hit the LP bound: $bf")
    // capacity invariant: no bin over budget under either strategy
    val lens = Map(0L -> 60L, 1L -> 60L, 2L -> 60L, 3L -> 40L, 4L -> 40L, 5L -> 40L)
    Seq(nf, bf).foreach { m =>
      m.groupBy(_._2).foreach { case (b, ds) =>
        assert(ds.keys.map(lens).sum <= 100, s"bin $b over budget in $m")
      }
    }
  }

  test("packSequencesAtomic: null text and null ids degrade gracefully, shard hash matches shardAssign") {
    // null text packs as a 0-token doc, a null id falls to shard 0 —
    // neither may NPE the partition fold (packSequences' contract)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType),
      StructField("text", StringType)))
    val docs = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, "A", "five words of real text"),
        Row(2L, "A", null),
        Row(null, "A", "doc with a null id")),
      schema)
    val out = TextOps.packSequencesAtomic(docs, "doc_id", "text", "source",
        budget = 100, nShards = 1, strategy = "bfd")
      .collect()
    assert(out.length == 3)
    val byId = out.map(r =>
      (if (r.isNullAt(2)) None else Some(r.getLong(2))) -> r.getLong(3)).toMap
    assert(byId(Some(2L)) == 0L, "null text packs as zero tokens")
    assert(byId.contains(None), "null-id row survives the fold")
    // shard membership agrees with shardAssign for the same ids
    import spark.implicits._
    val typed = Seq((7L, "A", "x"), (8L, "A", "y")).toDF("doc_id", "source", "text")
    val packShards = TextOps.packSequencesAtomic(typed, "doc_id", "text",
        "source", budget = 100, nShards = 4)
      .collect().map(r => r.getLong(2) -> r.getInt(1)).toMap
    val assignShards = TextOps.shardAssign(typed, "doc_id", nShards = 4)
      .select("doc_id", "shard")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(packShards == assignShards,
      s"pack shards $packShards must equal shardAssign $assignShards")
  }

  test("packSequencesAtomic: oversized docs get singleton bins; shards pack independently") {
    import spark.implicits._
    val docs = Seq(
      (1L, "A", Seq.fill(150)("w").mkString(" ")), // oversized
      (2L, "A", Seq.fill(90)("w").mkString(" ")),
      (3L, "A", Seq.fill(90)("w").mkString(" "))
    ).toDF("doc_id", "source", "text")
    val bf = TextOps.packSequencesAtomic(docs, "doc_id", "text", "source",
        budget = 100, nShards = 1, strategy = "bfd")
      .collect().map(r => r.getLong(2) -> r.getLong(4)).toMap
    assert(bf.values.toSet.size == 3, s"oversized doc must sit alone: $bf")
    // with nShards = 4 the md5 split is the t35 shard hash: bins are
    // creation-ordered WITHIN each (source, shard) group
    val many = (0L until 40L).map(i =>
      (i, "A", Seq.fill(30 + (i % 5).toInt * 10)("w").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val out = TextOps.packSequencesAtomic(many, "doc_id", "text", "source",
      budget = 100, nShards = 4, strategy = "bfd").collect()
    val byShard = out.groupBy(_.getInt(1))
    assert(byShard.size == 4, "the md5 split must actually spread shards")
    byShard.foreach { case (_, rows) =>
      val bins = rows.map(_.getLong(4)).toSet
      assert(bins == (0L until bins.size).toSet, "bins creation-ordered per group")
      rows.groupBy(_.getLong(4)).foreach { case (_, ds) =>
        assert(ds.map(_.getLong(3)).sum <= 100)
      }
    }
  }

  test("piiScrub masks emails, IPs, and digit runs with typed placeholders") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail bob.smith+x@example.co.uk from 10.0.0.1 acct 123456789 end"),
      (2L, "no pii here")
    ).toDF("doc_id", "text")
    val rows = TextOps.piiScrub(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap
    assert(rows(1L) == ((1L, 1L, 1L, "mail <EMAIL> from <IP> acct <NUM> end")))
    assert(rows(2L) == ((0L, 0L, 0L, "no pii here")))
  }

  test("mixtureSample is deterministic and respects per-source rates") {
    import spark.implicits._
    val docs = (0L until 2000L).map(i => (i, s"src${i % 2}", "t"))
      .toDF("doc_id", "source", "text")
    val kept = TextOps.mixtureSample(docs, "doc_id", "source",
      Map("src0" -> 1.0, "src1" -> 0.25))
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") == 1000L)
    assert(bySrc("src1") > 150L && bySrc("src1") < 350L)
    // determinism: same input -> identical kept set
    val again = TextOps.mixtureSample(docs, "doc_id", "source",
      Map("src0" -> 1.0, "src1" -> 0.25))
    assert(kept.collect().map(_.getLong(0)).sorted.toSeq ==
      again.collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("winnowing guarantee: a shared window+k-1 token run yields a shared fingerprint") {
    import spark.implicits._
    // k=3, w=4 -> any shared run of >= 6 tokens must share a fingerprint
    val shared = "quick brown foxes jump over lazy"
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta epsilon"),
      (2L, s"one two three $shared four five"),
      (3L, "completely different words without any overlap here at all")
    ).toDF("doc_id", "text")
    val fp = TextOps.winnowFingerprints(docs, "doc_id", "text")
    val byDoc = fp.collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(1)).toSet }
    assert((byDoc(1L) & byDoc(2L)).nonEmpty, "shared run produced no shared fingerprint")
    assert((byDoc(1L) & byDoc(3L)).isEmpty)
  }

  test("curateCorpus drops exact dups, near dups, and low-quality docs") {
    import spark.implicits._
    // "the" x3 of ~40 tokens: stop ratio above 0.05, top-word frac below 0.12
    val good = "the quick brown fox jumps over a lazy dog and then that " +
      "fox runs back across this wide field to find more food for its den " +
      "while the dog sleeps on in some warm afternoon sun near the barn"
    val docs = Seq(
      (1L, good),
      (2L, good), // exact duplicate -> dropped
      (3L, good + " extra trailing words here"), // near-dup of 1 -> dropped
      (4L, "the " * 30 + "dog"), // repetition filter: top_word_frac ~ 0.97
      (5L, "short text only"), // length filter: < 20 tokens
      (6L, "palabra sin sentido xyzzy qwerty asdf zxcv poiu lkjh mnbv " * 3)
    ).toDF("doc_id", "text")
    val kept = TextOps.curateCorpus(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L))
  }

  test("simhash near-dup pairs: identical docs at hamming 0, disjoint docs absent") {
    import spark.implicits._
    // long enough that a one-word edit flips only a few of 64 bits
    // (short docs leave many bit-sums at zero, where any edit flips them)
    val base = "spark shuffles data between stages when keys move across " +
      "partitions and executors exchange blocks through the network while " +
      "the scheduler tracks tasks and stages retry on failure with lineage " +
      "recomputation keeping results correct even when workers vanish mid job"
    val docs = Seq(
      (1L, base),
      (2L, base), // identical -> hamming 0
      (3L, base + " mostly"), // near-identical -> small hamming
      (4L, "entirely unrelated content about garnet chemistry and thermobarometry xyz")
    ).toDF("doc_id", "text")
    val pairs = TextOps.simhashNearDupPairs(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 2L)) == 0)
    assert(pairs.get((1L, 3L)).exists(_ <= 3))
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("langId classifies function-word-bearing snippets; unknown below threshold") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat is on the mat and it is happy"),
      (2L, "der hund ist nicht mit der katze im haus"),
      (3L, "le chat est dans la maison et il est content"),
      (4L, "el perro es un animal y no es el gato"),
      (5L, "zxcvb qwerty asdfgh lkjhg poiuy"),
      (6L, "")
    ).toDF("doc_id", "text")
    val out = TextOps.langId(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(r.length - 1)).toMap
    assert(out(1L) == "en"); assert(out(2L) == "de")
    assert(out(3L) == "fr"); assert(out(4L) == "es")
    assert(out(5L) == "unknown"); assert(out(6L) == "unknown")
  }

  test("repetition stats match hand-computed fractions (Gopher rules)") {
    import spark.implicits._
    val docs = Seq(
      // words: the(3) cat(2) sat(1) -> n=6, top=3/6, dup=(6-3)/6
      // bigrams: "the cat"(2) "cat the"(2) "the sat"(1) -> n=5, top=2/5, dup=(5-3)/5
      (1L, "the cat the cat the sat"),
      (2L, "all distinct words here"),
      (3L, "solo"),
      (4L, "")
    ).toDF("doc_id", "text")
    val m = TextOps.repetitionStats(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getLong(1) == 6L)
    assert(math.abs(m(1L).getDouble(2) - 0.5) < 1e-9)
    assert(math.abs(m(1L).getDouble(3) - 0.5) < 1e-9)
    assert(m(1L).getLong(4) == 5L)
    assert(math.abs(m(1L).getDouble(5) - 0.4) < 1e-9)
    assert(math.abs(m(1L).getDouble(6) - 0.4) < 1e-9)
    // fully distinct doc: top = 1/n, dup = 0
    assert(math.abs(m(2L).getDouble(3) - 0.0) < 1e-9)
    // one token: word stats exist, bigram stats null
    assert(m(3L).getLong(1) == 1L && m(3L).isNullAt(5))
    // empty doc: zero counts, null fractions
    assert(m(4L).getLong(1) == 0L && m(4L).isNullAt(2))
  }

  test("winnowing density is ~2/(w+1) and short docs get one degenerate window") {
    import spark.implicits._
    val long = (1 to 300).map(i => s"tok${i % 91}").mkString(" ") // 298 grams
    val docs = Seq((1L, long), (2L, "just four tokens here"), (3L, "ab")).toDF("doc_id", "text")
    val fp = TextOps.winnowFingerprints(docs, "doc_id", "text")
    val n1 = fp.filter($"doc_id" === 1L).count()
    // expected ~ 2/(4+1) * 295 full windows ~ 118; distinct-ness over 91
    // repeating tokens lowers it; bound loosely both ways
    assert(n1 > 20 && n1 < 200, s"fingerprint density off: $n1")
    // doc 2: 4 tokens -> 2 grams < window -> exactly the min of both
    assert(fp.filter($"doc_id" === 2L).count() == 1)
    // doc 3: fewer than k tokens -> no grams -> no fingerprints
    assert(fp.filter($"doc_id" === 3L).count() == 0)
  }

  test("decontaminate flags benchmark-overlapping docs with distinct-shingle counts") {
    import spark.implicits._
    val bench = Seq(
      (1L, "the quick brown fox jumps"),       // shingles: 3 distinct
      (2L, "pack my box with liquor jugs"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // contains "the quick brown" + "quick brown fox" -> overlap 2
      (10L, "so the quick brown fox ran away"),
      // repeats one benchmark shingle twice -> still counts ONCE (distinct)
      (11L, "pack my box again pack my box"),
      (12L, "nothing shared with any benchmark")) // clean
      .toDF("doc_id", "text")
    val got = TextOps.decontaminate(corpus, bench, "doc_id", "text",
        shingleWords = 3)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((10L, 2L), (11L, 1L)))
    // minOverlap raises the bar
    val strict = TextOps.decontaminate(corpus, bench, "doc_id", "text",
      shingleWords = 3, minOverlap = 2)
    assert(strict.collect().map(_.getLong(0)).toSeq == Seq(10L))
  }

  test("chunkDocuments: stride windows, short tail, empty docs dropped") {
    import spark.implicits._
    val docs = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), // 10 tokens
      (2L, "a b"),                           // shorter than one chunk
      (3L, "... !!! ---"))                   // tokenizes to nothing
      .toDF("doc_id", "text")
    val got = TextOps.chunkDocuments(docs, "doc_id", "text",
        chunkTokens = 4, overlap = 1) // stride 3 -> starts 0,3,6,9
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 0L, 4L, "t0 t1 t2 t3"),
      (1L, 1L, 4L, "t3 t4 t5 t6"),
      (1L, 2L, 4L, "t6 t7 t8 t9"),
      (1L, 3L, 1L, "t9"),
      (2L, 0L, 2L, "a b")))
    // overlap tokens really are shared between consecutive chunks
    assert(got(0)._4.endsWith("t3") && got(1)._4.startsWith("t3"))
  }

  test("stratifiedSample: exact k per stratum, deterministic, prefilter-invariant") {
    import spark.implicits._
    val docs = (1L to 60L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "src")
    val a = TextOps.stratifiedSample(docs, "doc_id", "src", k = 4, oversample = 2.0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(a.groupBy(_._1).forall { case (_, rs) =>
      rs.size == 4 && rs.map(_._3).sorted == Seq(1L, 2L, 3L, 4L) })
    // same result with the prefilter wide open (oversample covers the
    // whole stratum): the threshold never cuts a top-k hash
    val b = TextOps.stratifiedSample(docs, "doc_id", "src", k = 4, oversample = 100.0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(a == b)
    // deterministic across runs
    val c = TextOps.stratifiedSample(docs, "doc_id", "src", k = 4, oversample = 2.0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(a == c)
  }

  test("dedupWithinDoc: keep-first order, blanks drop, cross-doc untouched") {
    import spark.implicits._
    val docs = Seq(
      (1L, "banner\n\nbody A\n\nbanner\n\n  \n\nfooter\n\nfooter"),
      (2L, "banner\n\nbody B"), // same banner in ANOTHER doc: kept (in-row only)
      (3L, "only one segment"),
      (4L, ""),
      (5L, null)).toDF("doc_id", "text")
    val got = TextOps.dedupWithinDoc(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == (("banner\n\nbody A\n\nfooter", 5L, 3L)))
    assert(got(2L) == (("banner\n\nbody B", 2L, 2L)),
      "within-doc dedup must not touch cross-document repeats")
    assert(got(3L) == (("only one segment", 1L, 1L)))
    assert(got(4L) == (("", 0L, 0L)) && got(5L) == (("", 0L, 0L)))
    // idempotence: a second pass changes nothing
    val twice = TextOps.dedupWithinDoc(
      TextOps.dedupWithinDoc(docs, "doc_id", "text")
        .selectExpr("doc_id", "clean_text as text"),
      "doc_id", "text")
    assert(twice.filter("n_seg != n_kept").count() == 0)
  }

  test("filterAblation: joint cells, marginals and grand total are exact") {
    import spark.implicits._
    // 4 docs: TT, TF, FT, TT — hand-checkable cube
    val docs = Seq((1L, true, true), (2L, true, false),
      (3L, false, true), (4L, true, true)).toDF("id", "a", "b")
    val cube = TextOps.filterAblation(docs,
        Seq("a" -> docs("a"), "b" -> docs("b")))
      .collect().map { r =>
        (if (r.isNullAt(0)) None else Some(r.getBoolean(0)),
         if (r.isNullAt(1)) None else Some(r.getBoolean(1)),
         r.getLong(2))
      }.map { case (a, b, n) => (a, b) -> n }.toMap
    assert(cube((Some(true), Some(true))) == 2, "survives-all cell")
    assert(cube((Some(true), None)) == 3, "a's pass marginal")
    assert(cube((None, Some(false))) == 1, "b's kill marginal")
    assert(cube((None, None)) == 4, "grand total")
    intercept[IllegalArgumentException] {
      TextOps.filterAblation(docs, Seq.empty)
    }
  }

  test("sentenceSplit: boundaries, dense index, fragments, empties") {
    import spark.implicits._
    val docs = Seq(
      (1L, "One. Two!! Three?  And a trailing fragment"),
      (2L, "No terminator at all"),
      (3L, "Ends clean."),
      (4L, ""),
      (5L, null)).toDF("doc_id", "text")
    val got = TextOps.sentenceSplit(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3))).groupBy(_._1)
    assert(got(1L).sortBy(_._2).map(_._3).toSeq ==
      Seq("One.", "Two!!", "Three?", "And a trailing fragment"))
    assert(got(1L).sortBy(_._2).map(_._2).toSeq == Seq(0, 1, 2, 3),
      "sentence index is dense 0-based")
    assert(got(1L).sortBy(_._2).map(_._4).toSeq == Seq(1L, 1L, 1L, 4L))
    assert(got(2L).map(_._3).toSeq == Seq("No terminator at all"))
    assert(got(3L).map(_._3).toSeq == Seq("Ends clean."),
      "a doc-final terminator does not open an empty sentence")
    assert(!got.contains(4L) && !got.contains(5L),
      "empty/null docs yield no sentences")
  }

  test("sentenceSplit abbreviation mode: 'Dr. Smith' stays one sentence") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Dr. Smith arrived. He met Prof. Jones, e.g. at noon."),
      (2L, "See Fig. 3 for details. No. 5 wins, etc. all around."),
      (3L, "A hard stop. Then more."),   // no abbreviations: unchanged
      (4L, "He said no. Then left.")     // lowercase 'no.' MUST split
    ).toDF("doc_id", "text")
    val got = TextOps.sentenceSplit(docs, "doc_id", "text",
        abbreviations = TextOps.DefaultAbbreviations)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2).map(_._3).toSeq }
    assert(got(1L) == Seq("Dr. Smith arrived.",
      "He met Prof. Jones, e.g. at noon."))
    assert(got(2L) == Seq("See Fig. 3 for details.",
      "No. 5 wins, etc. all around."))
    assert(got(3L) == Seq("A hard stop.", "Then more."))
    assert(got(4L) == Seq("He said no.", "Then left."))
    // default mode is unchanged (t89's contract): 'Dr.' still splits
    val plain = TextOps.sentenceSplit(docs.filter("doc_id = 1"),
        "doc_id", "text")
      .collect().map(_.getString(2)).toSeq
    assert(plain.head == "Dr.")
  }

  test("tokenBudgetSample: budget honored, one-doc overshoot, prefilter-invariant") {
    import spark.implicits._
    // 3 sources x 40 docs of 7 tokens each = 280 tokens/source
    val docs = (1L to 120L).map(i =>
      (i, "a b c d e f g", s"s${i % 3}")).toDF("doc_id", "text", "src")
    val a = TextOps.tokenBudgetSample(docs, "doc_id", "text", "src",
      budgetTokens = 100, oversample = 3.0).cache()
    val bySrc = a.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3))).groupBy(_._1)
    assert(bySrc.keySet == Set("s0", "s1", "s2"))
    bySrc.values.foreach { rows =>
      assert(rows.forall(_._4 < 100), "every kept doc starts inside budget")
      // 7-token docs against budget 100: exactly ceil(100/7)=15 kept,
      // total 105 — overshoot bounded by the last doc
      assert(rows.length == 15 && rows.map(_._3).sum == 105)
    }
    // prefilter-invariance: a wide-open threshold yields the same set
    val b = TextOps.tokenBudgetSample(docs, "doc_id", "text", "src",
      budgetTokens = 100, oversample = 100.0)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    // determinism under repartitioning
    val c = TextOps.tokenBudgetSample(docs.repartition(7), "doc_id",
      "text", "src", budgetTokens = 100, oversample = 3.0)
    assert(a.exceptAll(c).count() == 0 && c.exceptAll(a).count() == 0)
    // a source smaller than the budget survives whole
    val tiny = TextOps.tokenBudgetSample(
      docs.filter(docs("doc_id") <= 3), "doc_id", "text", "src",
      budgetTokens = 100)
    assert(tiny.count() == 3)
  }

  test("lmScore: hand-computed bigram cross-entropy with add-alpha smoothing") {
    import spark.implicits._
    val ref = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val tgt = Seq((10L, "a b c")).toDF("doc_id", "text")
    // ref model: cb("a b")=2, cb("b a")=1, cb("a c")=1; cu(a)=3, cu(b)=1; V=3
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val bitsAB = r6(math.log((3 + 0.1 * 3) / (2 + 0.1)) / math.log(2.0)) // seen
    val bitsBC = r6(math.log((1 + 0.1 * 3) / (0 + 0.1)) / math.log(2.0)) // unseen
    val got = TextOps.lmScore(ref, tgt, "doc_id", "text", alpha = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 1)
    assert(got(0)._1 == 10L && got(0)._2 == 2L)
    // exact mean of the integer micro-bit values (order-independent sum)
    val expected = (math.round(bitsAB * 1e6) + math.round(bitsBC * 1e6)) / 2.0 / 1e6
    assert(math.abs(got(0)._3 - expected) < 1e-12)
    // the unseen bigram costs more bits than the frequent one
    assert(bitsBC > bitsAB)
    // a sub-2-token doc gets no row
    assert(TextOps.lmScore(ref, Seq((11L, "solo")).toDF("doc_id", "text"),
      "doc_id", "text").count() == 0)
  }

  test("spanDedup cuts cross-document spans, keeps unique text, hash path agrees") {
    import spark.implicits._
    val shared = "w1 w2 w3 w4" // the repeated 4-token boilerplate run
    val docs = Seq(
      (1L, s"alpha $shared beta"),     // shared span at positions 1..4
      (2L, s"$shared gamma delta"),    // shared span at positions 0..3
      (3L, "unique text only here"),   // untouched
      (4L, "tiny"),                    // shorter than the span size
      (5L, shared)                     // degenerate: the whole doc is hot
    ).toDF("doc_id", "text")
    def run(hashed: Boolean) =
      TextOps.spanDedup(docs, "doc_id", "text", spanWords = 4, minDocs = 2,
          hashKeys = hashed)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val got = run(hashed = false)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(got(0)._2 == "alpha beta" && got(0)._4 == 4L)
    assert(got(1)._2 == "gamma delta" && got(1)._4 == 4L)
    assert(got(2)._2 == "unique text only here" && got(2)._4 == 0L)
    assert(got(3)._2 == "tiny" && got(3)._3 == 1L && got(3)._4 == 0L)
    // wall-to-wall boilerplate empties out but still gets its row
    assert(got(4)._2 == "" && got(4)._4 == 4L)
    // the xxhash64 scale path and the literal-gram oracle path agree
    assert(run(hashed = true).toSeq == got.toSeq)
  }

  test("spanDedup removes overlapping hot spans as a merged range") {
    import spark.implicits._
    // docs 1 and 2 share the 5-token run "a b c d e"; with spanWords=4
    // BOTH 4-grams ("a b c d", "b c d e") are hot in both docs, so the
    // merged coverage is the full 5-token range, not just one window
    val docs = Seq(
      (1L, "x a b c d e y"),
      (2L, "a b c d e z")
    ).toDF("doc_id", "text")
    val got = TextOps.spanDedup(docs, "doc_id", "text", spanWords = 4,
        minDocs = 2, hashKeys = false)
      .orderBy("doc_id").collect()
      .map(r => (r.getString(1), r.getLong(3)))
    assert(got(0) == ("x y", 5L))
    assert(got(1) == ("z", 5L))
  }

  test("spanDedupMaximal cuts a 60-token block as ONE span, not 53 grams") {
    import spark.implicits._
    // a 60-token boilerplate block shared by two docs: spanWords=8
    // makes 53 overlapping hot 8-grams, which must coalesce into a
    // single maximal [start, end) cut per document
    val block = (0 until 60).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"intro $block outro"),
      (2L, block),
      (3L, "no shared content here at all")
    ).toDF("doc_id", "text")
    val got = TextOps.spanDedupMaximal(docs, "doc_id", "text",
        spanWords = 8, minDocs = 2, hashKeys = false)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getLong(4),
        r.getString(5)))
    assert(got(0) == ((1L, "intro outro", 60L, 1L, "1-61")))
    assert(got(1) == ((2L, "", 60L, 1L, "0-60")))
    assert(got(2)._4 == 0L && got(2)._5 == "")
    // removed-token set identical to spanDedup's
    val flat = TextOps.spanDedup(docs, "doc_id", "text", spanWords = 8,
        minDocs = 2, hashKeys = false)
      .orderBy("doc_id").collect()
      .map(r => (r.getString(1), r.getLong(3)))
    assert(got.map(g => (g._2, g._3)).toSeq == flat.toSeq)
    // hash path agrees
    val hashed = TextOps.spanDedupMaximal(docs, "doc_id", "text",
        spanWords = 8, minDocs = 2, hashKeys = true)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getLong(4),
        r.getString(5)))
    assert(hashed.toSeq == got.toSeq)
  }

  test("spanDedupMaximal keeps DISJOINT hot runs as separate spans") {
    import spark.implicits._
    // two 8-token shared runs separated by unique middles: two spans,
    // and a run pair whose coverage is adjacent-but-overlapping merges
    val runA = (0 until 8).map(i => s"a$i").mkString(" ")
    val runB = (0 until 8).map(i => s"z$i").mkString(" ")
    val docs = Seq(
      (1L, s"$runA mid1x mid2x $runB"),
      (2L, s"$runA other filler words $runB")
    ).toDF("doc_id", "text")
    val got = TextOps.spanDedupMaximal(docs, "doc_id", "text",
        spanWords = 8, minDocs = 2, hashKeys = false)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(4), r.getString(5)))
    assert(got(0) == ((2L, "0-8;10-18")))
    assert(got(1) == ((2L, "0-8;11-19")))
  }

  test("dsirSelect ranks target-like raw docs first and is deterministic") {
    import spark.implicits._
    // target domain speaks "spark query table"; half the raw pool does
    // too, the other half speaks an unrelated vocabulary
    val target = (0L until 8L).map(i =>
      (1000L + i, "spark query table spark query table spark query"))
      .toDF("doc_id", "text")
    val raw = ((0L until 10L).map(i =>
        (i, "spark query table spark query table")) ++
      (10L until 20L).map(i =>
        (i, "zebra yak xylophone walrus vulture zebra yak")))
      .toDF("doc_id", "text")
    val got = TextOps.dsirSelect(raw, target, "doc_id", "text",
      buckets = 64, k = 10)
    val ids = got.select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids.length == 10)
    // all 10 winners come from the target-like half despite Gumbel noise
    // (the LLR gap between the halves dwarfs the noise scale)
    assert(ids.forall(_ < 10L), s"unexpected winners: $ids")
    // weights of target-like docs strictly exceed the off-domain ones
    val all = TextOps.dsirSelect(raw, target, "doc_id", "text",
      buckets = 64, k = 20).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert((0L until 10L).map(all).min > (10L until 20L).map(all).max)
    // byte-deterministic across runs
    val again = TextOps.dsirSelect(raw, target, "doc_id", "text",
      buckets = 64, k = 10).select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(again == ids)
  }

  test("gopherRules: per-rule statistics and verdicts on crafted docs") {
    import spark.implicits._
    val good = (("the quick brown fox jumps over that lazy dog and " * 6) +
      "we have fun with words to spare here now").trim
    val docs = Seq(
      (1L, good),                       // 69 words, stopword-rich -> pass
      (2L, "too short to have any of the required words"), // n_words < 50
      (3L, ("- item one\n" * 10).trim), // bullet_frac = 1.0 > 0.9
      (4L, good + " ### ... ... " + ("# " * 12).trim), // symbols over 10%
      (5L, "")                          // empty: everything null/zero
    ).toDF("doc_id", "text")
    val r = TextOps.gopherRules(docs, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getBoolean(8), "good doc must pass")
    assert(r(1L).getLong(1) == 69)
    assert(r(1L).getLong(7) >= 5, "distinct stopword hits")
    assert(!r(2L).getBoolean(8) && r(2L).getLong(1) < 50)
    assert(r(3L).getDouble(4) == 1.0 && !r(3L).getBoolean(8))
    // 15 '#' + 2 non-overlapping '...' over 84 whitespace words
    assert(math.abs(r(4L).getDouble(3) - math.rint(1e6 * 17.0 / 84) / 1e6)
      < 1e-9)
    assert(!r(4L).getBoolean(8))
    assert(r(5L).getLong(1) == 0 && r(5L).isNullAt(2) && !r(5L).getBoolean(8))
  }

  test("overlapContamination: fraction of distinct grams seen in the benchmark") {
    import spark.implicits._
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),       // fully contained
      (2L, "alpha beta gamma plus unrelated trailing words here"), // partial
      (3L, "nothing shared with benchmark content at all")) // clean
      .toDF("doc_id", "text")
    val r = TextOps.overlapContamination(corpus, bench, "doc_id", "text",
        shingleWords = 3, minFrac = 0.5).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3),
        x.getBoolean(4))).sortBy(_._1)
    // doc 1: 4 distinct 3-grams, all in the benchmark
    assert(r(0) == ((1L, 4L, 4L, 1.0, true)))
    // doc 2: 6 grams, exactly "alpha beta gamma" overlaps
    assert(r(1) == ((2L, 6L, 1L, 0.166667, false)))
    assert(r(2) == ((3L, 5L, 0L, 0.0, false)))
  }

  test("bm25Rank: self-retrieval, term-match ordering, rank contract") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark shuffles data across the cluster"),
      (2L, "spark spark spark and nothing else spark"),
      (3L, "gardening tips for growing tomatoes at home"),
      (4L, "cluster management and data shuffles in spark deployments"))
      .toDF("doc_id", "text")
    val qs = Seq((10L, "spark shuffles data across the cluster"))
      .toDF("query_id", "qtext")
    val r = TextOps.bm25Rank(docs, qs, "doc_id", "text", "query_id", "qtext",
        k = 3).orderBy("rank").collect()
    // the query IS doc 1: every query term present -> doc 1 first
    assert(r(0).getLong(1) == 1L && r(0).getInt(4) == 1)
    // doc 3 shares no terms -> never a candidate; ranks are 1..n dense
    assert(r.map(_.getLong(1)).toSet == Set(1L, 2L, 4L))
    assert(r.map(_.getInt(4)).toSeq == Seq(1, 2, 3))
    // n_terms counts MATCHED query terms: doc 4 shares 4, doc 2 shares 1
    val byDoc = r.map(x => x.getLong(1) -> x.getLong(2)).toMap
    assert(byDoc(4L) == 4L && byDoc(2L) == 1L)
    // scores strictly ordered, deterministic across runs
    assert(r.map(_.getDouble(3)).sliding(2).forall(p => p(0) >= p(1)))
    val again = TextOps.bm25Rank(docs, qs, "doc_id", "text", "query_id",
      "qtext", k = 3).orderBy("rank").collect()
    assert(again.map(_.toSeq).toSeq == r.map(_.toSeq).toSeq)
  }

  test("truncateTokens: head+tail budget, byte-exact passthrough, edge fracs") {
    import spark.implicits._
    val long = (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, "a  b c"),      // double space: passthrough must be byte-exact
      (2L, long))          // 20 tokens, budget 10 -> first 5 + last 5
      .toDF("doc_id", "text")
    val r = TextOps.truncateTokens(docs, "doc_id", "text",
        maxTokens = 10, headFrac = 0.5)
      .orderBy("doc_id").collect()
    assert(r(0).getString(2) == "a  b c" && !r(0).getBoolean(3),
      "under-budget text passes through byte-exact (double space kept)")
    assert(r(1).getString(2) ==
      "w1 w2 w3 w4 w5 w16 w17 w18 w19 w20" && r(1).getBoolean(3))
    assert(r(1).getLong(1) == 20L)
    // headFrac = 1.0: pure head truncation, no tail slice
    val headOnly = TextOps.truncateTokens(docs, "doc_id", "text",
        maxTokens = 4, headFrac = 1.0)
      .orderBy("doc_id").collect()
    assert(headOnly(1).getString(2) == "w1 w2 w3 w4")
    // headFrac = 0.0: pure tail truncation — no leading space from an
    // empty head join (concat_ws skips nulls, not empty strings)
    val tailOnly = TextOps.truncateTokens(docs, "doc_id", "text",
        maxTokens = 4, headFrac = 0.0)
      .orderBy("doc_id").collect()
    assert(tailOnly(1).getString(2) == "w17 w18 w19 w20")
  }

  test("leakSafeSplit: near-duplicates never straddle the split; frac honored") {
    import spark.implicits._
    // 30 groups of 3 near-identical docs (one unique suffix token) —
    // LSH must cluster each trio; singleton docs fill out the corpus
    val base = (0L until 30L).flatMap { g =>
      val words = (0 until 30).map(w => s"w${g * 7 + w % 19}").mkString(" ")
      (0 until 3).map(c => (g * 10 + c, s"$words v${g * 10 + c}"))
    }
    val singles = (900L until 950L).map(i =>
      (i, (0 until 30).map(w => s"u${i * 13 + w * 5}").mkString(" ")))
    val docs = (base ++ singles).toDF("doc_id", "text")
    val split = TextOps.leakSafeSplit(docs, "doc_id", "text", testFrac = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(split.length == docs.count())
    // every cluster is entirely one side
    val sidesPerCluster = split.groupBy(_._2).view
      .mapValues(_.map(_._3).toSet).toMap
    assert(sidesPerCluster.values.forall(_.size == 1),
      "a cluster straddles the train/test boundary")
    // the near-dup trios actually clustered together (guard against a
    // degenerate all-singletons run that would pass the check above)
    val trioClusters = split.filter(_._1 < 300).groupBy(_._1 / 10 * 10)
    assert(trioClusters.forall { case (_, ms) => ms.map(_._2).toSet.size == 1 },
      "each near-identical trio must share one cluster")
    // both sides populated at testFrac=0.3 over ~80 clusters
    val sides = split.map(_._3).toSet
    assert(sides == Set("train", "test"))
    // deterministic
    val again = TextOps.leakSafeSplit(docs, "doc_id", "text", testFrac = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(again.sortBy(_._1).toSeq == split.sortBy(_._1).toSeq)
  }

  test("charEntropy: known distributions, degenerate inputs, quality ordering") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaa"),            // zero entropy: one symbol
      (2L, "abab"),            // uniform over 2 -> ln 2
      (3L, "abcd"),            // uniform over 4 -> ln 4
      (4L, ""),                // empty -> 0 by contract
      (5L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val r = TextOps.charEntropy(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r(0).getDouble(3) == 0.0)
    assert(math.abs(r(1).getDouble(3) - math.log(2)) < 1e-5)
    assert(math.abs(r(2).getDouble(3) - math.log(4)) < 1e-5)
    assert(r(3).getLong(1) == 0L && r(3).getDouble(3) == 0.0)
    // natural language sits between single-char spam and uniform noise
    assert(r(4).getDouble(3) > 2.0 && r(4).getDouble(3) < 4.0)
    assert(r(4).getLong(2) > 20L, "pangram has > 20 distinct chars")
  }

  test("temperatureSample: alpha=1 is identity, alpha<1 reshapes toward uniform") {
    import spark.implicits._
    // 40 docs from "big", 5 from "rare" — ids interleaved so the hash
    // sampling sees no id-range structure
    val docs = (0L until 45L)
      .map(i => (i, if (i % 9 == 8) "rare" else "big"))
      .toDF("doc_id", "source")
    // alpha = 1: q == p, every rate is exactly 1.0 -> identity + copy=0
    val id = TextOps.temperatureSample(docs, "doc_id", "source", alpha = 1.0)
      .collect()
    assert(id.length == 45 && id.forall(_.getInt(2) == 0),
      "alpha=1 must keep every doc exactly once")
    // alpha = 0.25: the rare source's rate rises above 1 (upsampled),
    // the big source's falls below 1 (downsampled)
    val sm = TextOps.temperatureSample(docs, "doc_id", "source", alpha = 0.25)
    val bySrc = sm.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // q_rare = 5^.25/(5^.25+40^.25) ~ 0.373 -> expected rare rows
    // ~ 45*0.373 ~ 16.8 (rate ~3.36: 3 copies + ~36% a 4th);
    // q_big ~ 0.627 -> expected big rows ~ 28.2 of 40 (rate ~0.71)
    assert(bySrc("rare") > 10L, s"rare source must be upsampled, got $bySrc")
    assert(bySrc("big") < 40L, s"big source must be downsampled, got $bySrc")
    // deterministic across runs
    val again = TextOps.temperatureSample(docs, "doc_id", "source", alpha = 0.25)
      .orderBy("doc_id", "copy").collect().map(_.toSeq).toSeq
    assert(again == sm.orderBy("doc_id", "copy").collect().map(_.toSeq).toSeq)
  }

  test("bm25Rank maxDfRatio prunes stopword candidates before the postings join") {
    import spark.implicits._
    // "the" appears in EVERY doc (the stopword); "zebra" in exactly one.
    // A query of only those two words degenerates to a full-corpus
    // candidate set without the guard, and to zebra's single posting
    // with it.
    val docs = Seq(
      (1L, "the zebra grazes"),
      (2L, "the lion sleeps"),
      (3L, "the river bends"),
      (4L, "the mountain stands"))
      .toDF("doc_id", "text")
    val qs = Seq((10L, "the zebra")).toDF("query_id", "qtext")
    val unpruned = TextOps.bm25Rank(docs, qs, "doc_id", "text",
      "query_id", "qtext", k = 10).collect()
    assert(unpruned.map(_.getLong(1)).toSet == Set(1L, 2L, 3L, 4L),
      "without the guard every doc containing 'the' is a candidate")
    // df('the')/N = 1.0 > 0.5 -> pruned; df('zebra')/N = 0.25 stays
    val pruned = TextOps.bm25Rank(docs, qs, "doc_id", "text",
      "query_id", "qtext", k = 10, maxDfRatio = 0.5).collect()
    assert(pruned.map(_.getLong(1)).toSet == Set(1L),
      "with the guard the candidate set shrinks to the rare term's postings")
    assert(pruned.head.getLong(2) == 1L, "only the surviving term counts")
    // candidate ORDER among survivors is unchanged: doc 1 still first
    assert(pruned.head.getInt(4) == 1)
  }

  test("dedupAgainstCorpus absorbs index clashes, then dedups within batch") {
    import spark.implicits._
    val twin = (0 until 25).map(w => s"dup${w % 7}tok$w").mkString(" ")
    val existing = Seq(
      (1L, twin),
      (2L, (0 until 25).map(w => s"old$w").mkString(" "))).toDF("doc_id", "text")
    val idx = TextOps.lshBuckets(
      TextOps.minhashSignature(existing, "doc_id", "text", 8), "doc_id", 8, 2)
    val freshB = (0 until 25).map(w => s"newB${w * 5}").mkString(" ")
    val newDocs = Seq(
      (10L, twin + " tail10"),   // near-copy of existing doc 1 -> absorbed
      (11L, (0 until 25).map(w => s"newA${w * 3}").mkString(" ")), // kept
      (12L, freshB + " t12"),    // within-batch twins: keep the canonical
      (13L, freshB + " t13")     // drop the later one
    ).toDF("doc_id", "text")
    val got = TextOps.dedupAgainstCorpus(newDocs, idx, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(11L, 12L), s"got $got")
    // re-index the survivors: the NEXT batch's copy of doc 12 is absorbed
    val idx2 = idx.unionByName(TextOps.lshBuckets(
      TextOps.minhashSignature(
        newDocs.filter(
          org.apache.spark.sql.functions.col("doc_id").isin(11L, 12L)),
        "doc_id", "text", 8), "doc_id", 8, 2))
    val next = Seq((20L, freshB + " t20")).toDF("doc_id", "text")
    assert(TextOps.dedupAgainstCorpus(next, idx2, "doc_id", "text").count() == 0)
  }

  test("hashEmbed emits unit vectors where similar text lands closer") {
    import spark.implicits._
    val a = (0 until 30).map(w => s"alpha tok${w % 9} body").mkString(" ")
    val docs = Seq(
      (1L, a), (2L, a + " tail"),                      // near-identical pair
      (3L, (0 until 30).map(w => s"zeta u${w * 7}").mkString(" ")))
      .toDF("doc_id", "text")
    val emb = TextOps.hashEmbed(docs, "doc_id", "text", dim = 32)
    val rows = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1).map(_.toDouble)).toMap
    assert(rows.size == 3)
    // micro-unit encoding: ||v|| ~ 1e6 within rounding slack
    rows.values.foreach { v =>
      val n = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(n - 1e6) < 100, s"norm $n drifted from 1e6")
    }
    def cos(x: Seq[Double], y: Seq[Double]) =
      x.zip(y).map { case (a, b) => a * b }.sum /
        (math.sqrt(x.map(v => v * v).sum) * math.sqrt(y.map(v => v * v).sum))
    val near = cos(rows(1L), rows(2L))
    val far = cos(rows(1L), rows(3L))
    assert(near > 0.9, s"near-identical docs cosine $near")
    assert(far < near - 0.3, s"disjoint-vocab cosine $far vs near $near")
    // the output feeds the similarity stack directly (micro-unit longs
    // cast like any embedding column): exact top-1 for doc 1 is doc 2
    val embCol = emb.withColumnRenamed("emb", "embedding")
    val top = graft.sim.Similarity.cosineTopK(embCol,
      embCol.filter(org.apache.spark.sql.functions.col("doc_id") === 1),
      "doc_id", "embedding", k = 1).collect()
    assert(top.head.getLong(1) == 2L)
  }

  test("qualitySample keeps by clamped probability, deterministically") {
    import spark.implicits._
    val n = 1000L
    def docs(p: Double) = (0L until n).map(i => (i, p)).toDF("doc_id", "p")
    def kept(p: Double) = TextOps.qualitySample(docs(p), "doc_id", "p").count()
    assert(kept(1.0) == n && kept(0.0) == 0L)
    // clamping: out-of-range probabilities behave as their clamp
    assert(kept(2.0) == n && kept(-1.0) == 0L)
    // p=0.5 keeps about half (hash-uniform), and the same half each run
    val half = kept(0.5)
    assert(half > 400 && half < 600, s"got $half of $n at p=0.5")
    val a = TextOps.qualitySample(docs(0.5), "doc_id", "p")
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = TextOps.qualitySample(docs(0.5), "doc_id", "p")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
    // null probability drops the row
    val withNull = Seq((1L, Some(1.0)), (2L, None)).toDF("doc_id", "p")
    assert(TextOps.qualitySample(withNull, "doc_id", "p")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    // a higher-p doc set strictly contains the lower-p keeps (monotone)
    val k3 = TextOps.qualitySample(docs(0.3), "doc_id", "p")
      .collect().map(_.getLong(0)).toSet
    val k7 = TextOps.qualitySample(docs(0.7), "doc_id", "p")
      .collect().map(_.getLong(0)).toSet
    assert(k3.subsetOf(k7))
  }

  test("perplexityBuckets orders head <= middle <= tail within every source") {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    assume(new java.io.File(s"$dir/documents.parquet").exists)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val b = TextOps.perplexityBuckets(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") < 250),
      docs.filter(org.apache.spark.sql.functions.col("doc_id") >= 250),
      "doc_id", "text", "source").cache()
    val bySource = b.collect()
      .groupBy(_.getString(1))
      .view.mapValues(_.map(r => (r.getString(4), r.getDouble(3))))
    bySource.foreach { case (src, rows) =>
      val head = rows.filter(_._1 == "head").map(_._2)
      val mid = rows.filter(_._1 == "middle").map(_._2)
      val tail = rows.filter(_._1 == "tail").map(_._2)
      // quartile cutoffs: every bucket populated at this corpus size,
      // and the bits ordering is total across buckets
      assert(head.nonEmpty && mid.nonEmpty && tail.nonEmpty, s"source $src")
      assert(head.max <= mid.min, s"source $src head/middle overlap")
      assert(mid.max <= tail.min, s"source $src middle/tail overlap")
      // quartiles: head and tail each hold no more than ~30% of docs
      val n = rows.length.toDouble
      assert(head.length <= n * 0.35 && tail.length <= n * 0.35, s"source $src")
    }
    b.unpersist()
  }

  test("dedupParagraphs keeps the first (doc, pos) occurrence corpus-wide") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared one\n\nunique a\n\nshared two"),
      (2L, "shared two\n\nunique b"),
      (3L, "shared one\n\nshared one\n\nunique c"), // within-doc dup too
      (4L, "shared one\n\nshared two")              // everything seen before
    ).toDF("doc_id", "text")
    val out = TextOps.dedupParagraphs(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((3L, 3L, "shared one\n\nunique a\n\nshared two")))
    // doc 2's "shared two" lost to doc 1 pos 2
    assert(out(2L) == ((2L, 1L, "unique b")))
    // doc 3: first "shared one" lost to doc 1 pos 0; its own second copy
    // loses to the SAME first occurrence (min doc then min pos)
    assert(out(3L) == ((3L, 1L, "unique c")))
    // doc 4 keeps nothing -> empty string, not null
    assert(out(4L) == ((2L, 0L, "")))
  }

  test("dedupParagraphs drops empty/whitespace paragraphs; hashKeys agrees") {
    import spark.implicits._
    val docs = Seq(
      (1L, "  \n\npar x\n\n\n\npar y"),
      (2L, "par y\n\npar z"),
      (3L, "")).toDF("doc_id", "text")
    val exact = TextOps.dedupParagraphs(docs, "doc_id", "text")
    // blank/empty paragraphs never count; the all-empty doc emits no row
    val rows = exact.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(1L -> 2L, 2L -> 2L))
    // the xxhash64 scale path returns the identical frame
    val hashed = TextOps.dedupParagraphs(docs, "doc_id", "text", hashKeys = true)
    assert(exact.exceptAll(hashed).count() == 0 &&
      hashed.exceptAll(exact).count() == 0)
  }

  test("redactPii counts and replaces each category once, in stage order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail a.b+c@x-y.co.uk and 10.0.0.1 ssn 123-45-6789 " +
        "+4915123456789 card 4111111111111111"),
      (2L, "no pii here"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = graft.text.PiiOps.redactPii(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert((1L to 5L).map(i => r1.getLong(i.toInt)) == Seq(1L, 1L, 1L, 1L, 1L))
    assert(r1.getLong(6) == 5L)
    assert(r1.getString(7) ==
      "mail [EMAIL] and [IP] ssn [SSN] [PHONE] card [CARD]")
    assert(out(2L).getLong(6) == 0L && out(2L).getString(7) == "no pii here")
    assert(out(3L).getLong(6) == 0L && out(3L).getString(7) == "")
  }

  test("redactPii attributes overlapping spans to the earliest stage") {
    import spark.implicits._
    // a 13-digit E.164 number is ALSO a PAN-length digit run: the phone
    // stage must claim it; a bare 14-digit run falls through to card
    val docs = Seq((1L, "+4930123456789 then 41111111111111"))
      .toDF("doc_id", "text")
    val r = graft.text.PiiOps.redactPii(docs, "doc_id", "text").collect()(0)
    assert(r.getLong(4) == 1L && r.getLong(5) == 1L, // n_phone, n_card
      s"got phone=${r.getLong(4)} card=${r.getLong(5)}")
    assert(r.getString(7) == "[PHONE] then [CARD]")
    // placeholders carry no digits, so re-running is a fixed point
    val again = graft.text.PiiOps.redactPii(
      Seq((1L, r.getString(7))).toDF("doc_id", "text"),
      "doc_id", "text").collect()(0)
    assert(again.getLong(6) == 0L && again.getString(7) == r.getString(7))
  }

  test("dropNearDuplicatesBy keeps the best-scoring cluster member") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "short"), (2L, "a much longer body of text wins here"),
      (5L, "mid length text"), (3L, "untouched"), (6L, "also untouched"))
      .toDF("doc_id", "text")
    val kept = TextOps.dropNearDuplicatesBy(docs, "doc_id",
        pairs((1L, 2L), (2L, 5L)), size(TextOps.tokens(col("text"))))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // cluster {1,2,5}: 2 has the most tokens -> 2 survives, NOT min-id 1
    assert(kept == Seq(2L, 3L, 6L))
  }

  test("dropNearDuplicatesBy breaks score ties by minimum id") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq((9L, "same len"), (7L, "same len"), (8L, "same len"))
      .toDF("doc_id", "text")
    val kept = TextOps.dropNearDuplicatesBy(docs, "doc_id",
        pairs((7L, 9L), (8L, 9L)), size(TextOps.tokens(col("text"))))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(7L))
  }

  test("normalized-key dedup collapses case/punct/whitespace variants") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello, World!"), (2L, "hello world"), (3L, "  HELLO   world .."),
      (4L, "different content")).toDF("doc_id", "text")
    val groups = TextOps.exactDupGroupsNormalized(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(groups == Set((3L, 1L), (1L, 4L)))
    val kept = TextOps.dropExactDuplicatesNormalized(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 4L))
  }

  test("weightedSample draws exactly k per source, excludes non-positive weights, deterministic") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = (1L to 50L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", if (i % 10 == 0) 0.0 else i.toDouble))
      .toDF("doc_id", "source", "w")
    val got = TextOps.weightedSample(docs, "doc_id", "source", col("w"), k = 5)
    assert(got.count() == 10)
    assert(got.groupBy("source").count().collect()
      .map(_.getLong(1)).forall(_ == 5L))
    assert(got.filter(col("weight") <= 0).count() == 0)
    val again = TextOps.weightedSample(docs, "doc_id", "source", col("w"), k = 5)
    assert(got.orderBy("doc_id").collect().toSeq ==
      again.orderBy("doc_id").collect().toSeq)
  }

  test("weightedSample prefers heavy weights") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // u^(1/1e6) ~ 1 for any u; u^1000 ~ 0 unless u is within 1e-5 of 1
    val docs = ((1L to 30L).map(i => (i, "s", 0.001)) :+ ((99L, "s", 1e6)))
      .toDF("doc_id", "source", "w")
    val ids = TextOps.weightedSample(docs, "doc_id", "source", col("w"), k = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.contains(99L))
  }

  test("kmvSketch is exact below k and kmvDistinctEstimate reports it") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s1", "alpha beta gamma delta epsilon zeta"),
      (2L, "s1", "alpha beta gamma eta theta iota"))
      .toDF("doc_id", "source", "text")
    // 4 + 4 distinct 3-shingles with exactly "alpha beta gamma" shared -> 7
    val sk = TextOps.kmvSketch(docs, "source", "text", k = 256)
    assert(sk.count() == 7)
    val est = TextOps.kmvDistinctEstimate(sk, "source", 256).collect()(0)
    assert(est.getLong(1) == 7L && est.getDouble(2) == 7.0)
  }

  test("minhashRegisterOverlap: identical sources estimate 1, disjoint 0; shards min-merge exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "a", "one two three four five six"),
      (2L, "b", "one two three four five six"),
      (3L, "c", "seven eight nine ten eleven twelve"))
      .toDF("doc_id", "source", "text")
    def regs(df: org.apache.spark.sql.DataFrame) =
      TextOps.minhashRegisters(
        df.select(col("source"),
          explode(TextOps.shinglesOf(col("text"), 3)).as("sh")),
        "source", col("sh"), k = 32)
    val r = regs(docs)
    val ov = TextOps.minhashRegisterOverlap(r, "source").collect()
      .map(x => ((x.getString(0), x.getString(1)), x.getDouble(4))).toMap
    assert(ov(("a", "b")) == 1.0)
    assert(ov(("a", "c")) == 0.0 && ov(("b", "c")) == 0.0)
    // two shards min-merge to exactly the whole-corpus registers
    val merged = TextOps.minhashRegisterMerge(
      regs(docs.filter(col("doc_id") <= 1)),
      regs(docs.filter(col("doc_id") >= 2)))
    assert(merged.exceptAll(r).count() == 0)
    assert(r.exceptAll(merged).count() == 0)
  }

  test("kmvSourceOverlap: identical sources estimate 1, disjoint 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", "one two three four five six"),
      (2L, "b", "one two three four five six"),
      (3L, "c", "seven eight nine ten eleven twelve"))
      .toDF("doc_id", "source", "text")
    val sk = TextOps.kmvSketch(docs, "source", "text", k = 16)
    val ov = TextOps.kmvSourceOverlap(sk, "source", 16).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(4))).toMap
    assert(ov(("a", "b")) == 1.0)
    assert(ov(("a", "c")) == 0.0 && ov(("b", "c")) == 0.0)
  }
}
