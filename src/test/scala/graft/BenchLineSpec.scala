package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench final-line degrade ladder at simulated registry sizes:
  * every rung must emit a PARSEABLE JSON line under the harness tail
  * budget, and the grouped rung must keep per-query resolution for
  * every slow query. No SparkSession involved — renderFinal is pure. */
class BenchLineSpec extends AnyFunSuite {

  // a registry shaped like ours: p/q/t tracks, mostly-fast queries
  // with a bounded slow set
  private def registry(n: Int): Map[String, Double] = {
    (0 until n).map { i =>
      val track = Seq("p", "q", "t")(i % 3)
      val t = if (i % 12 == 0) 1.0 + (i % 7) * 0.77 else 0.08 + (i % 5) * 0.07
      f"$track${i}%03d_query_name_$i" -> t
    }.toMap
  }

  private def parse(line: String): Map[String, Any] = {
    // minimal JSON sanity: parseable by the same class of parser the
    // driver uses (strict key/number shapes, balanced braces)
    assert(line.startsWith("{") && line.endsWith("}"), line.take(80))
    assert(line.count(_ == '{') == line.count(_ == '}'), "balanced braces")
    assert(line.contains("\"metric\":\"total\""))
    Map("len" -> line.length)
  }

  test("140-query registry fits the 2-dp line with the warm map") {
    // (the synthetic entries here are ~2 chars wider than the real
    // registry's, so 140 here ~ the real 166)
    val r = registry(140)
    val warm = r.filter(_._2 > 1.0)
    val (line, diags) = Bench.renderFinal(r, warm, Nil, "sf0.1")
    parse(line)
    assert(line.length <= 1900)
    assert(diags.isEmpty, "no degrade at the current registry size")
  }

  test("220-query registry degrades to grouped subtotals, slow queries intact") {
    val r = registry(220)
    val warm = r.filter(_._2 > 1.0)
    val (line, diags) = Bench.renderFinal(r, warm, Nil, "sf0.1")
    parse(line)
    assert(line.length <= 1900, s"grouped line overflows: ${line.length}")
    assert(diags.exists(_.contains("final_line_grouped_subtotals")),
      s"expected the grouped rung; diags=$diags line=${line.take(120)}")
    assert(line.contains("\"tracks\":{\"p\":"), "per-track subtotals present")
    // EVERY >0.5s query resolves individually on the grouped line
    r.filter(_._2 > 0.5).keys.foreach { k =>
      val short = k.takeWhile(_ != '_')
      assert(line.contains(s"\"$short\":"), s"slow query $k missing")
    }
    assert(line.contains("\"queries_omitted\":"))
  }

  test("pathological registry (all slow) still emits a line via 1-dp rung") {
    val r = (0 until 400).map(i => f"t$i%03d_q" -> 2.0).toMap
    val (line, _) = Bench.renderFinal(r, Map.empty, Nil, "sf0.1")
    parse(line)
    // 400 all-slow queries blow even the grouped rung; the 1-dp line is
    // the floor and must still be the one emitted (never truncated)
    assert(line == Bench.renderFinal(r, Map.empty, Nil, "sf0.1")._1)
  }

  test("total_cold rides every rung and stays inside the budget") {
    for (n <- Seq(140, 220)) {
      val r = registry(n)
      val warm = r.filter(_._2 > 1.0)
      val (line, _) = Bench.renderFinal(r, warm, Nil, "sf0.1",
        coldTotal = r.values.sum + 3.25)
      parse(line)
      assert(line.length <= 1900, s"line overflows with total_cold: ${line.length}")
      assert(line.contains("\"total_cold\":"), s"total_cold missing at n=$n")
    }
    // default (-1) keeps the field out entirely — old call sites unchanged
    val (noCold, _) = Bench.renderFinal(registry(140), Map.empty, Nil, "sf0.1")
    assert(!noCold.contains("total_cold"))
  }

  test("failed queries stay listed on every rung") {
    val r = registry(220) + ("t999_dead" -> -1.0)
    val (line, _) = Bench.renderFinal(r, Map.empty, List("t999_dead"), "sf0.1")
    parse(line)
    assert(line.contains("\"failed\":[\"t999_dead\"]"))
    assert(!line.contains("\"t999\":-"), "failed time never emitted as negative")
  }
}
