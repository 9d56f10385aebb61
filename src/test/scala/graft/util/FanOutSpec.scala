package graft.util

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class FanOutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("single-split inputs fan out to full parallelism; wide inputs pass through") {
    import spark.implicits._
    val target = spark.sparkContext.defaultParallelism
    val narrow = spark.range(1000).toDF("id").coalesce(1)
    assert(FanOut(narrow).rdd.getNumPartitions == target)
    val wide = spark.range(1000).toDF("id").repartition(target)
    assert(FanOut(wide).rdd.getNumPartitions == target) // untouched
  }
}
