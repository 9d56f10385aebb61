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

  test("every registered query ANALYZES against the current testdata schemas") {
    // r7 regression class: the driver regenerated the testdata with a
    // different physical encoding (events.ts nanos -> micros) and 5
    // queries started failing ANALYSIS — invisible to sbt test, visible
    // only as silently-missing correctness rows. Building each query's
    // DataFrame forces full analysis (and any driver-side model fits)
    // against the real sf0.001 files, so a schema drift in ANY table
    // now fails the suite with the query name and the analysis error.
    // No job is launched for the plan itself (construction only), so
    // the sweep stays cheap; queries that train driver-side models
    // (k-means seeds etc.) run their small fits at this SF.
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    assume(new java.io.File(dir).exists,
      s"testdata dir $dir absent; set SPARK_GRAFT_SF_DIR to run the sweep")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).schema; None }
        catch { case e: Throwable =>
          Some(s"$name: ${Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator.take(2).mkString(" | ")}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries failed analysis:\n${failures.mkString("\n")}")
  }
}
