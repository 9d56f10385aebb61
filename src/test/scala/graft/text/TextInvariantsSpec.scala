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
}
