package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-partition fact tables by their join key
  * ONCE at write time so every later equi-join or aggregation on that
  * key runs shuffle-free — at 100 TB the single biggest cost lever for
  * repeated fact-to-fact joins (e.g. lineitem ⋈ orders on orderkey
  * every day: one write-time shuffle amortized over every query).
  *
  * Bucketing beats `repartition()` because the layout PERSISTS: Spark
  * records the bucket spec in the catalog and plans both sides of a
  * same-bucketing join without an Exchange (asserted in spec). Pick
  * bucket counts so one bucket of the LARGER table fits an executor
  * (e.g. 100 TB / 4096 buckets ≈ 25 GB per bucket pre-compression) and
  * use the SAME count on both sides — mismatched counts reintroduce a
  * shuffle on the smaller side.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table. Sorting within
    * buckets additionally enables shuffle-AND-sort-free sort-merge
    * joins. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Equi-join two same-bucketed tables on their bucket keys — plans
    * with zero Exchange when both sides share the bucket spec. */
  def cosortedJoin(spark: SparkSession, left: String, right: String,
      keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)
}
