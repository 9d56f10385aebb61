package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // two disjoint vocabularies: "good" docs draw from one word set,
  // "spam" docs from another — linearly separable by construction
  private def corpus = {
    import spark.implicits._
    val good = (0L until 30L).map { i =>
      (i, (0 until 12).map(j => s"quality${(i + j) % 9}").mkString(" "), 1.0)
    }
    val spam = (100L until 130L).map { i =>
      (i, (0 until 12).map(j => s"junk${(i * 3 + j) % 9}").mkString(" "), 0.0)
    }
    (good ++ spam).toDF("doc_id", "text", "y")
  }

  test("trained LR separates disjoint-vocabulary classes") {
    val docs = corpus
    val model = Classifier.trainTextClassifier(docs, "doc_id", "text", "y")
    val scored = Classifier.scoreTextClassifier(docs, "doc_id", "text", model)
      .join(docs.select("doc_id", "y"), "doc_id")
      .collect().map(r => (r.getAs[Double]("score"), r.getAs[Double]("y")))
    val posMean = scored.filter(_._2 == 1.0).map(_._1).sum / 30
    val negMean = scored.filter(_._2 == 0.0).map(_._1).sum / 30
    assert(posMean > negMean + 0.1,
      s"classes must separate: pos=$posMean neg=$negMean")
    val acc = scored.count { case (s, y) => (s >= 0.5) == (y == 1.0) } / 60.0
    assert(acc >= 0.9, s"accuracy $acc on separable data")
  }

  test("training is deterministic: identical models across runs") {
    val docs = corpus
    val m1 = Classifier.trainTextClassifier(docs, "doc_id", "text", "y")
    val m2 = Classifier.trainTextClassifier(docs, "doc_id", "text", "y")
    assert(m1 == m2)
    assert(m1.weights.nonEmpty && m1.weights.size <= 256)
  }

  test("featureless documents score at the bias; scoring covers all rows") {
    import spark.implicits._
    val docs = corpus
    val model = Classifier.trainTextClassifier(docs, "doc_id", "text", "y")
    val oneTok = Seq((999L, "single")).toDF("doc_id", "text")
    val r = Classifier.scoreTextClassifier(oneTok, "doc_id", "text", model)
      .collect()
    assert(r.length == 1, "a doc with no bigrams still gets a score row")
    val sigB = 1.0 / (1.0 + math.exp(-model.bias))
    assert(math.abs(r(0).getDouble(1) - sigB) < 1e-5)
  }

  test("more iterations move the model toward the labels") {
    val docs = corpus
    def loss(iters: Int): Double = {
      val m = Classifier.trainTextClassifier(docs, "doc_id", "text", "y",
        iterations = iters)
      Classifier.scoreTextClassifier(docs, "doc_id", "text", m)
        .join(docs.select("doc_id", "y"), "doc_id")
        .collect().map { r =>
          val p = r.getAs[Double]("score"); val y = r.getAs[Double]("y")
          -(y * math.log(p.max(1e-9)) + (1 - y) * math.log((1 - p).max(1e-9)))
        }.sum / 60.0
    }
    val l2 = loss(2); val l8 = loss(8)
    assert(l8 < l2, s"log loss must fall with iterations: $l2 -> $l8")
  }
}
