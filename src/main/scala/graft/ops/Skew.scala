package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins.
  *
  * A shuffled equi-join sends every row of a key to one reducer; a hot
  * key (one customer with 10% of all events, the empty-string bucket, a
  * default id) turns that reducer into the stage's straggler while the
  * rest of the cluster idles. AQE's runtime skew-join split handles the
  * sort-merge case when statistics catch it; [[saltedJoin]] is the
  * explicit, planner-independent form — the standard fix when the hot
  * keys are known to exist but not which ones they are.
  *
  * Mechanics: the BIG (skewed) side gets a deterministic salt in
  * [0, nSalts) hashed from a caller-chosen column (its row id / primary
  * key — anything uniformly distributed), the SMALL side is replicated
  * once per salt value, and the join key becomes (key, salt). The hot
  * key's rows now spread across nSalts reducers instead of one. Cost:
  * the small side shuffles nSalts× its size — choose the side and
  * nSalts so that stays cheap (it is still far below broadcast-size
  * territory, which is when you'd use `broadcast()` instead).
  */
object Skew {

  /** The deterministic salt in [0, nSalts) — shared by [[saltedJoin]]
    * and its distribution spec so the test observes the operator's REAL
    * salt construction, not a re-implementation. */
  private[graft] def saltCol(saltBy: Column, nSalts: Int): Column =
    pmod(hash(saltBy), lit(nSalts))

  /** Salted shuffle equi-join on shared key columns.
    *
    * @param big    the large, possibly skewed side — salted, never
    *               replicated
    * @param small  the replicated side (nSalts copies); must be the
    *               smaller input but may exceed broadcast size
    * @param on     equality key columns present on both sides
    * @param saltBy a `big`-side expression with uniform distribution
    *               (its primary key); the salt is `pmod(hash(saltBy),
    *               nSalts)`, deterministic so retried tasks and both
    *               sides of a self-join compute identical salts
    * @param nSalts fan-out of the hot keys = replication factor of
    *               `small`
    * @param joinType any Spark join type whose semantics survive
    *               key-space refinement: inner/left/left_semi/left_anti
    *               (each `big` row still meets every matching `small`
    *               row exactly once, in its own salt bucket)
    */
  def saltedJoin(big: DataFrame, small: DataFrame, on: Seq[String],
      saltBy: Column, nSalts: Int, joinType: String = "inner"): DataFrame = {
    require(nSalts > 0, s"nSalts must be positive, got $nSalts")
    val reserved = "__salt"
    require(!(big.columns ++ small.columns).contains(reserved),
      s"column $reserved collides with saltedJoin's internal salt column")
    require(Set("inner", "left", "left_outer", "left_semi", "left_anti")
      .contains(joinType),
      s"$joinType does not survive key refinement: a right/full join " +
        "would emit one unmatched-small row PER SALT COPY")
    val salted = big.withColumn(reserved, saltCol(saltBy, nSalts))
    val replicated = small.withColumn(reserved,
      explode(array((0 until nSalts).map(lit): _*)))
    salted.join(replicated, on :+ reserved, joinType).drop(reserved)
  }
}
