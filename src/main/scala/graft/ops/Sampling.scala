package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, exact, skew-proof sampling operators.
  *
  * The pipeline staple "take exactly k rows per stratum,
  * reproducibly" (train/dev carve-outs, per-source caps, eval-slice
  * freezes) is usually written as a per-stratum rank window + filter —
  * which single-tasks a stratum holding most of the corpus (real
  * corpora are source-skewed). Here selection rides the k-bounded
  * heap aggregate ([[graft.util.TopK.topKRows]]): per-stratum partials
  * combine MAP-SIDE, so a corpus-sized stratum reduces to k-row
  * partials per task and max-task stays O(input partition) no matter
  * the stratum histogram.
  */
object Sampling {

  /** Exactly the `k` first rows of each stratum under the caller's
    * total order — pass an integer-hash order for an unbiased but
    * reproducible pseudo-random sample, or a quality score for
    * "best k per source". Rows keep all input columns plus `rankCol`
    * (1-based position within the stratum, consistent with
    * `row_number()` under (orderCols, idCol)).
    *
    * `idCol` must be unique per row within a stratum (it both breaks
    * order ties and keys the join that restores the full row). A NULL
    * stratum is a real group (null-safe join back, matching what the
    * window formulation would rank). The winners table is
    * |strata| × k rows with NO broadcast hint — a many-strata corpus
    * can make it large, so the planner (AQE) picks the join strategy
    * from runtime stats. */
  def stratifiedTakeExact(df: DataFrame, strataCol: String, idCol: String,
      orderCols: Seq[Column], k: Int, rankCol: String = "rk"): DataFrame = {
    require(k > 0, s"stratifiedTakeExact: k must be positive, got $k")
    require(orderCols.nonEmpty, "stratifiedTakeExact: empty orderCols " +
      "(pass e.g. an integer-hash column for a pseudo-random sample)")
    require(!df.columns.contains(rankCol),
      s"stratifiedTakeExact: rank column `$rankCol` already on the input")
    Seq(strataCol, idCol).foreach(c => require(df.columns.contains(c),
      s"stratifiedTakeExact: column `$c` not in ${df.columns.toSeq}"))
    val ordFields = orderCols.zipWithIndex.map { case (c, i) =>
      c.as(s"o$i")
    }
    val top = df.groupBy(col(strataCol))
      .agg(graft.util.TopK.topKRows(
        struct(ordFields :+ col(idCol).as("id"): _*), k).as("__top"))
      .select(col(strataCol).as("__strata"), posexplode(col("__top")))
      .select(col("__strata"), col("col.id").as("__id"),
        (col("pos") + 1).cast("long").as(rankCol))
    // null-safe on the id too: a NULL-id row the heap selected must
    // join back (an equi-join would silently drop it, leaving a rank
    // gap); uniqueness-per-stratum then extends to "at most one NULL
    // id per stratum", same as any other id value
    df.join(top, df(strataCol) <=> top("__strata") &&
        df(idCol) <=> top("__id"))
      .drop("__strata", "__id")
  }
}
