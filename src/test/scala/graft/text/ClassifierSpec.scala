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

  test("driver fast-path model is bit-identical to the distributed loop") {
    import spark.implicits._
    val docs = corpus
    val lab = docs.select(col("doc_id"), col("y")).localCheckpoint()
    val nl = lab.count()
    val feats = Classifier.features(docs, "doc_id", "text", 256)
      .localCheckpoint()
    val local = Classifier.trainLoop(feats, lab, "doc_id", nl, 256, 8, 2.0,
      maxLocalRows = Long.MaxValue)
    val dist = Classifier.trainLoop(feats, lab, "doc_id", nl, 256, 8, 2.0,
      maxLocalRows = 0L)
    assert(local == dist)
    assert(local.weights.nonEmpty)
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

  test("one-vs-rest separates a planted 3-class corpus, held-out included") {
    import spark.implicits._
    // three disjoint vocabularies; 20 labeled docs per class plus a
    // held-out doc per class that the model never saw
    val vocab = Map(
      "code" -> "def class import return lambda yield async await",
      "news" -> "minister election parliament treaty summit embassy vote",
      "chat" -> "lol omg brb gonna wanna kinda sorta yeah")
    def doc(cls: String, i: Long): String = {
      val ws = vocab(cls).split(" ")
      (0 until 12).map(j => ws(((i + j) % ws.length).toInt)).mkString(" ")
    }
    val labeled = vocab.keys.toSeq.sorted.zipWithIndex.flatMap {
      case (c, k) => (0L until 20L).map(i => (k * 100L + i, doc(c, i), c))
    }.toDF("doc_id", "text", "label")
    val model = Classifier.trainMultiClassClassifier(labeled, "doc_id",
      "text", "label", iterations = 8)
    assert(model.classes == Seq("chat", "code", "news"))
    val heldOut = Seq((900L, doc("code", 7L), "code"),
      (901L, doc("news", 7L), "news"), (902L, doc("chat", 7L), "chat"))
      .toDF("doc_id", "text", "truth")
    val preds = Classifier.scoreMultiClassClassifier(
        labeled.unionByName(heldOut.select(col("doc_id"), col("text"),
          lit("?").as("label"))), "doc_id", "text", model)
      .join(labeled.select(col("doc_id"), col("label").as("truth"))
        .unionByName(heldOut.select("doc_id", "truth")), "doc_id")
      .select("doc_id", "pred_label", "truth")
      .as[(Long, String, String)].collect()
    assert(preds.length == 63)
    val wrong = preds.filter(p => p._2 != p._3)
    assert(wrong.isEmpty, s"misclassified: ${wrong.mkString(", ")}")
  }

  test("one-vs-rest training is deterministic and reuses one feature pass") {
    import spark.implicits._
    val docs = (0L until 30L).map(i =>
      (i, if (i % 3 == 0) "alpha beta gamma alpha beta"
          else if (i % 3 == 1) "delta epsilon zeta delta epsilon"
          else "eta theta iota eta theta",
        s"c${i % 3}")).toDF("doc_id", "text", "label")
    val m1 = Classifier.trainMultiClassClassifier(docs, "doc_id", "text",
      "label", iterations = 4)
    val m2 = Classifier.trainMultiClassClassifier(docs, "doc_id", "text",
      "label", iterations = 4)
    assert(m1.classes == m2.classes)
    for (c <- m1.classes) {
      assert(m1.models(c).weights == m2.models(c).weights)
      assert(m1.models(c).bias == m2.models(c).bias)
    }
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

  test("duplicate ids in the labeled frame are rejected loudly") {
    // the driver fast-path and the distributed loop only agree on
    // distinct-id inputs (rm.toMap vs inner-join multiplicity), so the
    // trainers enforce the contract instead of silently diverging
    val spark = TestSpark.spark
    import spark.implicits._
    val dup = corpus.union(corpus.limit(1))
    val e1 = intercept[IllegalArgumentException] {
      Classifier.trainTextClassifier(dup, "doc_id", "text", "y")
    }
    assert(e1.getMessage.contains("distinct"))
    val mc = dup.withColumn("label",
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("c"),
        (org.apache.spark.sql.functions.col("doc_id") % 3).cast("string")))
    val e2 = intercept[IllegalArgumentException] {
      Classifier.trainMultiClassClassifier(mc, "doc_id", "text", "label")
    }
    assert(e2.getMessage.contains("distinct"))
  }
}
