package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The compiled kernels must agree bit-for-bit with the HOF reference
  * formulation they replace (the DuckDB oracle pins the same contract
  * externally on t04/t05). */
class TextKernelsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val tricky: Seq[String] = Seq(
    "The quick brown fox jumps over the lazy dog",
    "  leading and trailing  ",
    "punct!!!heavy,,,text---with***separators",
    "UPPER lower MiXeD 123 abc123def",
    "unicode café naïve 中文 words between",
    "", "   ", "one", "one two", "a b c d e",
    "tabs\tand\nnewlines\r\nhere",
    "digits 42 7x7 0abc",
    "Élève Über straße") // lowercases outside ascii

  def hofTokens(c: org.apache.spark.sql.Column) =
    filter(split(lower(c), "[^a-z0-9]+"), x => x =!= lit(""))

  test("Tokens kernel == filter(split(lower)) HOF on tricky strings") {
    val df = tricky.toDF("t")
    val got = df.select(TextOps.tokens(col("t")).as("k"),
      hofTokens(col("t")).as("h")).collect()
    got.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString)
    }
  }

  test("Shingles kernel == HOF shingles over materialized tokens (n=1,2,3)") {
    val df = tricky.toDF("t")
    for (n <- Seq(1, 2, 3)) {
      val got = df
        .select(TextOps.shinglesOf(col("t"), n).as("k"),
          hofTokens(col("t")).as("__w"))
        .select(col("k"), TextOps.shingles(col("__w"), n).as("h"))
        .collect()
      got.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"n=$n ${r.toString}")
      }
    }
  }

  test("kernel expressions survive whole-stage codegen and null input") {
    val df = Seq(Some("a b c d"), None, Some("x")).toDF("t")
    val out = df.select(TextOps.tokens(col("t")).as("k"),
      TextOps.shinglesOf(col("t"), 2).as("s")).collect()
    assert(out(0).getSeq[String](0) == Seq("a", "b", "c", "d"))
    assert(out(0).getSeq[String](1) == Seq("a b", "b c", "c d"))
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
    assert(out(2).getSeq[String](0) == Seq("x") && out(2).getSeq[String](1) == Nil)
  }
}
