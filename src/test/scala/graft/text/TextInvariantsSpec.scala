package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Scalacheck-style invariants for the round-9 curation operators over
  * a deterministic pseudo-random corpus (hash-derived, no RNG state —
  * the HpxeosSpec grid discipline): properties that must hold on ANY
  * input, not just the crafted cases the unit specs pin. */
class TextInvariantsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** 200 docs of 2-6 paragraphs drawn from a 23-paragraph pool plus
    * hash-salted one-off paragraphs — heavy cross-doc duplication with
    * deterministic structure. */
  private def corpus = {
    import spark.implicits._
    (0L until 200L).map { i =>
      val n = 2 + (i * 7 % 5).toInt
      val ps = (0 until n).map { j =>
        val h = i * 31 + j * 17
        if (h % 3 == 0) s"pool paragraph ${h % 23} shared text"
        else s"unique ${i}_$j paragraph body ${h % 101}"
      }
      (i, ps.mkString("\n\n"))
    }.toDF("doc_id", "text")
  }

  test("dedupParagraphs: kept mass equals the distinct paragraph count") {
    val docs = corpus
    val out = TextOps.dedupParagraphs(docs, "doc_id", "text").cache()
    val distinctPars = docs
      .select(explode(split(col("text"), "\n\n")).as("p"))
      .select(trim(col("p")).as("p")).filter(col("p") =!= "")
      .distinct().count()
    // exactly one survivor per distinct paragraph, spread over the docs
    assert(out.agg(sum("n_kept")).collect()(0).getLong(0) == distinctPars)
    // kept never exceeds total; every doc with paragraphs emits a row
    assert(out.filter(col("n_kept") > col("n_paragraphs")).count() == 0)
    assert(out.count() == docs.count())
    // reassembled text carries only paragraphs of the original doc, in
    // original order (subsequence check via position recovery)
    val bad = out.join(docs, "doc_id")
      .select(col("doc_id"), split(col("text_dedup"), "\n\n").as("kept"),
        split(col("text"), "\n\n").as("orig"))
      .filter(col("text_dedup") =!= "")
      .filter(!expr(
        "forall(kept, k -> array_contains(orig, k))"))
    assert(bad.count() == 0, "a reassembled doc held a foreign paragraph")
    out.unpersist()
  }

  test("redactPii: redaction is a fixed point on any input") {
    import spark.implicits._
    // plant PII fragments on a hash-chosen subset; leave others clean
    val docs = (0L until 150L).map { i =>
      val base = s"doc $i body with tok${i % 13} and tok${(i * 7) % 17}"
      val planted =
        (if (i % 3 == 0) s" u$i@host$i.org" else "") +
          (if (i % 4 == 0) s" 10.${i % 256}.0.${(i * 3) % 256}" else "") +
          (if (i % 5 == 0) s" +4930${1000000 + i}" else "")
      (i, base + planted)
    }.toDF("doc_id", "text")
    val once = PiiOps.redactPii(docs, "doc_id", "text")
      .select(col("doc_id"), col("text_redacted").as("text"))
    val twice = PiiOps.redactPii(once, "doc_id", "text")
    assert(twice.filter(col("n_pii") =!= 0).count() == 0,
      "second redaction pass found residual PII")
    assert(twice.filter(col("text_redacted") =!= col("text")).count() == 0)
  }

  test("qualitySample: pointwise-larger probabilities keep a superset") {
    import spark.implicits._
    val probs = (0L until 300L).map { i =>
      val p = (i * 37 % 100).toDouble / 100.0
      (i, p, math.min(1.0, p + 0.25))
    }.toDF("doc_id", "p_lo", "p_hi")
    val lo = TextOps.qualitySample(probs, "doc_id", "p_lo")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val hi = TextOps.qualitySample(probs, "doc_id", "p_hi")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(lo.subsetOf(hi), s"lost ids: ${lo -- hi}")
    assert(hi.size > lo.size, "the +0.25 margin must admit someone")
  }

  test("dedupAgainstCorpus: no clash survives, and the op is idempotent") {
    val docs = corpus
    val existing = docs.filter(col("doc_id") < 100)
    val newDocs = docs.filter(col("doc_id") >= 100)
    val idx = TextOps.lshBuckets(
      TextOps.minhashSignature(existing, "doc_id", "text", 8), "doc_id", 8, 2)
      .localCheckpoint()
    val out = TextOps.dedupAgainstCorpus(newDocs, idx, "doc_id", "text")
      .localCheckpoint()
    // survivors are a subset of the new batch
    assert(out.join(newDocs, Seq("doc_id"), "left_anti").count() == 0)
    // no survivor shares a bucket with the index
    val survBux = TextOps.lshBuckets(
      TextOps.minhashSignature(out, "doc_id", "text", 8), "doc_id", 8, 2)
    assert(survBux.join(idx.select("bucket").distinct(), "bucket").count() == 0)
    // idempotence: re-running the survivors against the same index is a
    // no-op (no clash remains, no within-batch dup remains)
    val again = TextOps.dedupAgainstCorpus(out, idx, "doc_id", "text")
    assert(again.count() == out.count())
    assert(again.join(out, Seq("doc_id"), "left_anti").count() == 0)
  }

  test("hashEmbed: every emitted vector is unit-norm in micro-units") {
    val emb = TextOps.hashEmbed(corpus, "doc_id", "text", dim = 32)
    val offNorm = emb.select(
        aggregate(col("emb"), lit(0L), (a, x) => a + x * x).as("ss"))
      .filter(abs(sqrt(col("ss").cast("double")) - lit(1e6)) > 100)
    assert(offNorm.count() == 0)
    assert(emb.count() == corpus.count())
  }

  /** Deterministic term frame: group gK carries exactly 400*(K+1)
    * distinct terms (disjoint across groups), each duplicated 1-3x. */
  private def termFrame = {
    import spark.implicits._
    (0 until 4).flatMap { g =>
      (0 until 400 * (g + 1)).flatMap { i =>
        val copies = 1 + (i * 13 + g) % 3
        Seq.fill(copies)((s"g$g", s"term_${g}_$i"))
      }
    }.toDF("grp", "term")
  }

  test("hllDistinct: exact column is exact; estimate within HLL error") {
    val out = TextOps.hllDistinct(termFrame, "grp", col("term")).cache()
    val rows = out.collect().map(r =>
      r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows.keySet == Set("g0", "g1", "g2", "g3"))
    (0 until 4).foreach { g =>
      val (est, exact, relErr) = rows(s"g$g")
      assert(exact == 400L * (g + 1), s"g$g exact off: $exact")
      // m=256 -> ~6.5% std error; 20% is >3 sigma and the input is
      // deterministic, so this can never flake once green
      assert(relErr < 0.20, s"g$g rel_err $relErr (est $est)")
    }
  }

  test("hllDistinct: partitioning-invariant and small-range accurate") {
    import spark.implicits._
    // 7 distinct terms -> the linear-counting branch; near-exact there
    val tiny = (0 until 7).flatMap(i => Seq.fill(3)(("only", s"t$i")))
      .toDF("grp", "term")
    val est = TextOps.hllDistinct(tiny, "grp", col("term"))
      .collect()(0).getDouble(1)
    assert(math.abs(est - 7.0) < 0.5, s"linear-counting est $est")
    // hash-determinism: a different physical partitioning cannot move
    // the estimate by even an ulp
    val a = TextOps.hllDistinct(termFrame, "grp", col("term")).collect()
    val b = TextOps.hllDistinct(termFrame.repartition(7), "grp", col("term"))
      .collect()
    assert(a.sortBy(_.getString(0)).map(_.toString).toSeq ==
      b.sortBy(_.getString(0)).map(_.toString).toSeq)
  }

  test("hllMerge: sharded registers merge to the whole-corpus sketch") {
    val whole = termFrame
    // shard by an arbitrary hash — shards overlap in groups, not terms
    val shardA = whole.filter(pmod(xxhash64(col("term")), lit(3)) === 0)
    val shardB = whole.filter(pmod(xxhash64(col("term")), lit(3)) === 1)
    val shardC = whole.filter(pmod(xxhash64(col("term")), lit(3)) === 2)
    val merged = TextOps.hllMerge(
      TextOps.hllRegisters(shardA, "grp", col("term")),
      TextOps.hllRegisters(shardB, "grp", col("term")),
      TextOps.hllRegisters(shardC, "grp", col("term")))
    val direct = TextOps.hllRegisters(whole, "grp", col("term"))
    // register-exact equality: merge loses NOTHING vs a full recompute
    assert(merged.union(direct).distinct().count() == direct.count())
    // and the estimates are therefore bit-identical
    val a = TextOps.hllEstimate(merged, "grp").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = TextOps.hllEstimate(direct, "grp").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a == b)
    // duplicate-shard idempotence: merging a shard with itself is a no-op
    val dup = TextOps.hllMerge(
      TextOps.hllRegisters(shardA, "grp", col("term")),
      TextOps.hllRegisters(shardA, "grp", col("term")))
    assert(dup.union(TextOps.hllRegisters(shardA, "grp", col("term")))
      .distinct().count() == dup.count())
  }

  test("corpusStats registers: shard-merge exact, derived card matches rollup") {
    import spark.implicits._
    val docs = (0L until 300L).map { i =>
      val src = s"s${i % 3}"
      val text = if (i % 17 == 0) "" else ("w " * (5 + (i % 80)).toInt).trim
      (i, text, src)
    }.toDF("doc_id", "text", "source")
    val direct = TextOps.corpusStatsRegisters(docs, "doc_id", "text", "source")
    val merged = TextOps.corpusStatsMerge(
      TextOps.corpusStatsRegisters(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", "source"),
      TextOps.corpusStatsRegisters(docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", "source"))
    assert(merged.union(direct).distinct().count() == direct.count(),
      "register shards must merge exactly to the whole-corpus registers")
    // the derived card equals the one-call corpusStats (incl. ALL row)
    val viaRegs = TextOps.corpusStatsFrom(merged, "source")
    val oneCall = TextOps.corpusStats(docs, "doc_id", "text", "source")
    assert(viaRegs.exceptAll(oneCall).count() == 0 &&
      oneCall.exceptAll(viaRegs).count() == 0)
    assert(oneCall.filter(col("source") === "ALL").count() == 1)
  }

  test("snapshotDiff: statuses partition the id universe correctly") {
    import spark.implicits._
    val oldSnap = (0L until 100L).map(i => (i, s"doc $i body")).toDF("id", "t")
    val newSnap = (50L until 150L).map { i =>
      (i, if (i % 10 == 0) s"doc $i body EDITED" else s"doc $i body")
    }.toDF("id", "t")
    val d = TextOps.snapshotDiff(oldSnap, newSnap, "id", "t").cache()
    val by = d.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(by("added") == 50)    // 100..149
    assert(by("removed") == 50)  // 0..49
    assert(by("changed") == 5)   // 50,60,...,90
    assert(by("unchanged") == 45)
    // every id appears exactly once
    assert(d.count() == d.select("id").distinct().count())
    assert(d.count() == 150)
    // diffing a snapshot against itself is all-unchanged
    val self = TextOps.snapshotDiff(oldSnap, oldSnap, "id", "t")
    assert(self.filter(col("status") =!= "unchanged").count() == 0)
  }

  test("tokenDrift: zero for the corpus's own mix, positive for drift") {
    import spark.implicits._
    // two sources with IDENTICAL token mixes -> both KLs equal and ~0;
    // a third source with an alien vocabulary -> clearly larger KL
    val docs = (0 until 300).map { i =>
      val src = if (i < 100) "a" else if (i < 200) "b" else "alien"
      val txt = if (src == "alien") s"zzq$i xkcd qwerty uniq${i % 7}"
      else s"the quick brown fox ${i % 5} jumps over dogs"
      (i.toLong, src, txt)
    }.toDF("id", "src", "t")
    val kl = TextOps.tokenDrift(docs, "id", "t", "src").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(kl.keySet == Set("a", "b", "alien"))
    // a and b have identical distributions -> identical KL values
    assert(kl("a") == kl("b"))
    assert(kl("alien") > kl("a") + 100000L,
      s"alien ${kl("alien")} not clearly above ${kl("a")}")
    // determinism under repartitioning (integer micro-nat sums)
    val kl2 = TextOps.tokenDrift(docs.repartition(7), "id", "t", "src")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(kl == kl2)
  }

  test("scriptDetect: exact counts, dominance, tie-break, unknown") {
    import spark.implicits._
    val cases = Seq(
      (1L, "hello мир мир"),          // 5 latin, 6 cyrillic
      (2L, "正体中文字"),              // 5 cjk only
      (3L, "αβγ abc"),               // 3-3 greek/latin tie -> latin first
      (4L, "12345 !?"),              // no script chars
      (5L, null.asInstanceOf[String]))
      .toDF("id", "t")
    val got = TextOps.scriptDetect(cases, "id", "t").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Long]("n_latin") == 5 &&
      got(1L).getAs[Long]("n_cyrillic") == 6 &&
      got(1L).getAs[String]("script") == "cyrillic")
    assert(got(2L).getAs[Long]("n_cjk") == 5 &&
      got(2L).getAs[String]("script") == "cjk" &&
      got(2L).getAs[Double]("script_frac") == 1.0)
    // tie goes to the earlier ScriptClasses entry (latin)
    assert(got(3L).getAs[String]("script") == "latin")
    assert(got(4L).getAs[String]("script") == "unknown" &&
      got(4L).isNullAt(got(4L).fieldIndex("script_frac")))
    assert(got(5L).getAs[String]("script") == "unknown")
  }

  test("normalizeText: idempotent, exact on crafted cases, clean-text noop") {
    import spark.implicits._
    val cases = Seq(
      (1L, "  “hi” there – ok\r\nnextline  "),
      (2L, "a\n\n\n\n\nb\t\tc‘d’…"),
      (3L, "already clean text"),
      (4L, "")).toDF("id", "t")
    val once = graft.text.NormalizeOps.normalizeText(cases, "id", "t")
    val got = once.collect().map(r => r.getLong(0) ->
      (r.getString(1), r.getBoolean(2))).toMap
    assert(got(1L) == ("\"hi\" there - ok\nnextline", true))
    assert(got(2L) == ("a\n\nb c'd'...", true))
    assert(got(3L) == ("already clean text", false))
    assert(got(4L) == ("", false))
    // idempotence: a second pass changes nothing and reports changed=false
    val twice = graft.text.NormalizeOps.normalizeText(
      once.select(col("id"), col("text_norm").as("t")), "id", "t")
    assert(twice.filter(col("changed")).count() == 0)
    assert(twice.withColumnRenamed("text_norm", "t2").join(once, "id")
      .filter(col("t2") =!= col("text_norm")).count() == 0)
  }

  test("unicodeNormalize: known forms, idempotence, composition with normalizeText") {
    import spark.implicits._
    val cases = Seq(
      (1L, "éclair"), // decomposed -> U+00E9 under every form
      (2L, "Ångstrom"), // angstrom sign -> U+00C5
      (3L, "ﬁle"), // fi ligature: NFC keeps, NFKC folds
      (4L, "ＡBC"), // fullwidth A: NFKC-only
      (5L, "① x²"), // circled one + superscript two
      (6L, "plain ascii"),
      (7L, null)).toDF("id", "t")
    val nfkc = graft.text.NormalizeOps.unicodeNormalize(cases, "id", "t")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getBoolean(2))).toMap
    assert(nfkc(1L) == ("éclair", true))
    assert(nfkc(2L) == ("Ångstrom", true))
    assert(nfkc(3L) == ("file", true))
    assert(nfkc(4L) == ("ABC", true))
    assert(nfkc(5L) == ("1 x2", true))
    assert(nfkc(6L) == ("plain ascii", false))
    assert(nfkc(7L) == ("", false), "null text normalizes to empty")
    val nfc = graft.text.NormalizeOps.unicodeNormalize(
      cases, "id", "t", form = "NFC").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap
    assert(nfc(1L) == ("éclair", true))
    assert(nfc(3L) == ("ﬁle", false), "NFC keeps compatibility chars")
    assert(nfc(4L) == ("ＡBC", false))
    // NFD round-trip: NFC(NFD(x)) == NFC(x) on the composed cases
    val viaNfd = graft.text.NormalizeOps.unicodeNormalize(
      graft.text.NormalizeOps.unicodeNormalize(cases, "id", "t", "NFD")
        .select(col("id"), col("text_uni").as("t")), "id", "t", "NFC")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaNfd(1L) == "éclair" && viaNfd(2L) == "Ångstrom")
    // idempotence (Unicode stability guarantee)
    val twice = graft.text.NormalizeOps.unicodeNormalize(
      graft.text.NormalizeOps.unicodeNormalize(cases, "id", "t")
        .select(col("id"), col("text_uni").as("t")), "id", "t")
    assert(twice.filter(col("changed")).count() == 0)
    // composition: NFKC first, then the regex cascade — both passes
    // fire on a doc that needs both (ligature + curly quotes + CRLF)
    val messy = Seq((1L, "“ﬁle”\r\nok")).toDF("id", "t")
    val composed = graft.text.NormalizeOps.normalizeText(
      graft.text.NormalizeOps.unicodeNormalize(messy, "id", "t")
        .select(col("id"), col("text_uni").as("t")), "id", "t")
      .collect()(0)
    assert(composed.getString(1) == "\"file\"\nok")
    assert(composed.getBoolean(2))
  }

  test("histQuantiles: merge-exact shards, ordered and bounded estimates") {
    import spark.implicits._
    // deterministic long-tailed values: mostly small, some huge
    val vals = (0 until 3000).map { i =>
      val g = s"g${i % 2}"
      val v = if (i % 17 == 0) 100000L + i else 10L + (i % 97)
      (g, v)
    }.toDF("grp", "v")
    val direct = TextOps.histRegisters(vals, "grp", col("v"))
    // shard merge is register-exact, like hllMerge
    val merged = TextOps.histMerge(
      TextOps.histRegisters(vals.filter(col("v") % 2 === 0), "grp", col("v")),
      TextOps.histRegisters(vals.filter(col("v") % 2 === 1), "grp", col("v")))
    assert(merged.union(direct).distinct().count() == direct.count())
    val q = TextOps.histQuantiles(direct, "grp",
      Seq(0.1, 0.5, 0.9, 1.0)).cache()
    // one estimate per (group, frac); estimates are monotone in frac
    assert(q.count() == 8)
    val byG = q.collect().groupBy(_.getString(0))
    byG.values.foreach { rows =>
      val sorted = rows.sortBy(_.getDouble(1)).map(_.getDouble(2))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
    }
    // estimates stay inside the observed value range; the 1.0-quantile
    // is EXACTLY the group max (top bucket's vmax)
    val ext = vals.groupBy("grp").agg(min("v").as("lo"), max("v").as("hi"))
    assert(q.join(ext, "grp")
      .filter(col("est") < col("lo") || col("est") > col("hi"))
      .count() == 0)
    assert(q.filter(col("frac") === 1.0).join(ext, "grp")
      .filter(col("est") =!= col("hi").cast("double")).count() == 0)
    // nonpositive values are excluded, not mis-bucketed
    val withJunk = vals.union(Seq(("g0", 0L), ("g1", -5L)).toDF("grp", "v"))
    assert(TextOps.histRegisters(withJunk, "grp", col("v"))
      .union(direct).distinct().count() == direct.count())
  }

  test("cmsEstimate: never undercounts, exact on collision-free widths") {
    import spark.implicits._
    val occ = termFrame.select(col("term").as("t"))
    val exact = occ.groupBy("t").agg(count(lit(1)).as("exact_n"))
    // narrow sketch -> collisions happen; the CMS guarantee must hold
    // for EVERY term anyway
    val regs = TextOps.cmsRegisters(occ, col("t"), depth = 4, width = 64)
    val est = TextOps.cmsEstimate(regs, occ, "t", depth = 4, width = 64)
    val under = est.join(exact, "t")
      .filter(col("cms_est") < col("exact_n")).count()
    assert(under == 0, "count-min undercounted a term")
    // register state is bounded by the sketch shape, not the vocabulary
    assert(regs.count() <= 4L * 64)
    // total mass per row equals the stream length (no occurrence lost)
    val mass = regs.groupBy("row").agg(sum("n").as("m"))
      .select(collect_set("m")).collect()(0).getSeq[Long](0)
    assert(mass == Seq(occ.count()))
    // unknown probes report 0 (never negative / null)
    val ghost = TextOps.cmsEstimate(regs,
      Seq("never_seen_term_xyz").toDF("t"), "t", depth = 4, width = 64)
      .collect()(0).getLong(1)
    assert(ghost >= 0L)
    // a wide sketch on a small vocabulary is near-exact and
    // deterministic under repartitioning
    val wide = TextOps.cmsRegisters(occ.repartition(9), col("t"))
    val est2 = TextOps.cmsEstimate(wide, occ, "t")
    val est2b = TextOps.cmsEstimate(TextOps.cmsRegisters(occ, col("t")),
      occ, "t")
    assert(est2.join(est2b.withColumnRenamed("cms_est", "e2"), "t")
      .filter(col("cms_est") =!= col("e2")).count() == 0)
  }

  test("corpusStats: the ALL rollup row is the exact column-wise total") {
    val docs = corpus.withColumn("source",
      concat(lit("s"), (col("doc_id") % 3).cast("string")))
    val out = TextOps.corpusStats(docs, "doc_id", "text", "source").cache()
    assert(out.count() == 4) // 3 sources + ALL
    val all = out.filter(col("source") === "ALL").collect()(0)
    val parts = out.filter(col("source") =!= "ALL")
      .agg(sum("n_docs"), sum("total_tokens"), sum("total_chars"),
        max("max_tokens"))
      .collect()(0)
    assert(all.getAs[Long]("n_docs") == parts.getLong(0))
    assert(all.getAs[Long]("total_tokens") == parts.getLong(1))
    assert(all.getAs[Long]("total_chars") == parts.getLong(2))
    assert(all.getAs[Long]("max_tokens") == parts.getLong(3))
    // fractions live in [0,1]; avg * n_docs recovers the token total
    // to rounding
    val bad = out.filter(col("short_frac") < 0 || col("short_frac") > 1 ||
      col("empty_frac") < 0 || col("empty_frac") > 1 ||
      abs(col("avg_tokens") * col("n_docs") - col("total_tokens")) > 0.5)
    assert(bad.count() == 0)
  }
}
