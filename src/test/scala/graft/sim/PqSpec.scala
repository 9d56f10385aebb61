package graft.sim

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Product-quantization encode + ADC search. */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 4-dim vectors, m=2 subspaces of subDim=2
  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  private lazy val corpus = vecs(
    0L -> Seq(0f, 0f, 0f, 0f),
    1L -> Seq(1f, 1f, 1f, 1f),
    2L -> Seq(0f, 0f, 1f, 1f),   // sub0 like code 0, sub1 like code 1
    3L -> Seq(0.1f, 0f, 0.9f, 1f))
  private lazy val cb = Similarity.pqCodebook(
    corpus.filter(col("vec_id") < 2), "vec_id", "embedding", m = 2, subDim = 2)

  test("pqEncode assigns exact codebook vectors to themselves with zero error") {
    val enc = Similarity.pqEncode(corpus, cb, "vec_id", "embedding", 2, 2)
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getDouble(2)))
    assert(enc(0) == ((0L, Seq(0L, 0L), 0.0)))
    assert(enc(1) == ((1L, Seq(1L, 1L), 0.0)))
    assert(enc(2) == ((2L, Seq(0L, 1L), 0.0)))
    // vec 3 is near (code0, code1) with small positive error
    assert(enc(3)._2 == Seq(0L, 1L) && enc(3)._3 > 0.0 && enc(3)._3 < 0.1)
  }

  test("pqEncode ties break toward the smaller code id") {
    val dupCb = Similarity.pqCodebook(
      vecs(5L -> Seq(0f, 0f, 0f, 0f), 6L -> Seq(0f, 0f, 0f, 0f)),
      "vec_id", "embedding", m = 2, subDim = 2)
    val enc = Similarity.pqEncode(vecs(9L -> Seq(0f, 0f, 0f, 0f)), dupCb,
        "vec_id", "embedding", 2, 2)
      .collect()(0)
    assert(enc.getSeq[Long](1) == Seq(5L, 5L))
  }

  test("pqAdcSearch ranks the query's own cell closest and excludes self") {
    val enc = Similarity.pqEncode(corpus, cb, "vec_id", "embedding", 2, 2)
    val qs = corpus.filter(col("vec_id") === 2L)
    val out = Similarity.pqAdcSearch(enc, cb, qs, "vec_id", "embedding",
        m = 2, subDim = 2, k = 2)
      .orderBy("adist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(!out.exists(_._2 == 2L), "self excluded")
    // vec 3 shares vec 2's codes -> ADC distance equals the q->codes
    // distance, the minimum among candidates
    assert(out.head._2 == 3L)
    assert(out.length == 2)
  }

  test("pqAdcSearch keeps id-coincident candidates with excludeSelf=false") {
    val enc = Similarity.pqEncode(corpus, cb, "vec_id", "embedding", 2, 2)
    val qs = corpus.filter(col("vec_id") === 2L)
    val out = Similarity.pqAdcSearch(enc, cb, qs, "vec_id", "embedding",
        m = 2, subDim = 2, k = 4, excludeSelf = false)
      .collect().map(_.getLong(1)).toSet
    assert(out.contains(2L))
  }

  test("pqTrainCodebook reduces total quantization error vs the id-prefix codebook") {
    // two clusters per subspace; seeds 0/1 sit off the cluster centers,
    // so Lloyd must move the centroids to beat the raw prefix sample
    val c = vecs(
      0L -> Seq(0.3f, 0f, 0.3f, 0f),
      1L -> Seq(0.7f, 1f, 0.7f, 1f),
      2L -> Seq(0f, 0f, 0f, 0f),
      3L -> Seq(0.1f, 0f, 0.1f, 0f),
      4L -> Seq(1f, 1f, 1f, 1f),
      5L -> Seq(0.9f, 1f, 0.9f, 1f))
    def totalErr(cb: org.apache.spark.sql.DataFrame): Double =
      Similarity.pqEncode(c, cb, "vec_id", "embedding", 2, 2)
        .agg(sum("err")).collect()(0).getDouble(0)
    val prefix = Similarity.pqCodebook(
      c.filter(col("vec_id") < 2), "vec_id", "embedding", m = 2, subDim = 2)
    val trained = Similarity.pqTrainCodebook(c, "vec_id", "embedding",
      m = 2, subDim = 2, initIds = Seq(0L, 1L), iterations = 2)
    assert(totalErr(trained) < totalErr(prefix))
  }

  test("pqTrainCodebook keeps the (code_id, sub_idx, subvec) contract and seed ranks") {
    val trained = Similarity.pqTrainCodebook(corpus, "vec_id", "embedding",
      m = 2, subDim = 2, initIds = Seq(1L, 0L), iterations = 1)
    val rows = trained.orderBy("code_id", "sub_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).length))
    // code_id = rank in initIds (seed 1L -> code 0), one row per
    // (code, subspace), subvecs at subDim
    assert(rows.map(t => (t._1, t._2)).toSeq ==
      Seq((0L, 0), (0L, 1), (1L, 0), (1L, 1)))
    assert(rows.forall(_._3 == 2))
  }

  test("ADC distance equals the summed per-subspace table entries") {
    val enc = Similarity.pqEncode(corpus, cb, "vec_id", "embedding", 2, 2)
    val qs = vecs(10L -> Seq(0.5f, 0.5f, 0.5f, 0.5f))
    val out = Similarity.pqAdcSearch(enc, cb, qs, "vec_id", "embedding",
        m = 2, subDim = 2, k = 4)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    // q sub-distance to code0 = 0.25+0.25 = 0.5 per subspace; to code1 same
    // -> every candidate's ADC distance is 1.0 regardless of codes
    assert(out.values.toSet == Set(1.0))
    assert(out.keySet == Set(0L, 1L, 2L, 3L))
  }
}
