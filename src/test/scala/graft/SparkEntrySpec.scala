package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract itself: the smoke query returns rows and
  * every registered query carries an oracle (a missing oracle row would
  * silently weaken the correctness gate to rows-only). */
class SparkEntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry() flagship query returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries missing oracles: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without queries: ${(o -- q).toSeq.sorted}")
  }

  test("query names are unique under the bench's short-key compaction") {
    val prefixes = SparkEntry.queries.keySet.groupBy(_.takeWhile(_ != '_'))
    val collisions = prefixes.filter(_._2.size > 1)
    assert(collisions.isEmpty,
      s"short-id collisions (bench falls back to full names, inflating the " +
        s"final line): $collisions")
  }
}
