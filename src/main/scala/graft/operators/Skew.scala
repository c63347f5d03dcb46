package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation for equi-joins.
  *
  * First line of defense is AQE's skew-join splitting (on in
  * GraftSession); this utility is for the cases AQE can't fix — e.g. a
  * hot key whose rows must still co-group, or a build side that's
  * replicable. The left (skewed) side gets a deterministic salt in
  * [0, saltFactor); the right side is replicated once per salt value;
  * the join key becomes (key, salt), so the hot key's rows spread over
  * `saltFactor` reducers instead of one.
  *
  * Cost model: right side grows ×saltFactor — use when |right| ≪ |left|
  * and the hot key dominates a reducer. Salt is derived from the full
  * row content (xxhash64 of the row struct), so it is deterministic
  * under retries and independent of physical layout.
  */
object Skew {

  /** Join types where replicating the right side is sound: the right
    * side's multiplicity never reaches the output unmatched. Right/full
    * outer joins would emit saltFactor-1 spurious null-padded rows per
    * right row. */
  private val SupportedJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti")

  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    require(SupportedJoinTypes.contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left/left_semi/left_anti, not $joinType")
    val salted = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(saltFactor.toLong)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-stage salted aggregation for hot grouping keys: pre-aggregate
    * on (key, salt) — spreading a hot key's rows over `saltFactor`
    * reducers — then combine the partials on the key alone. Spark's
    * hash aggregate already partial-combines map-side, which covers
    * most skew; the explicit salt stage matters when the hot key's
    * SHUFFLED partials still overwhelm one reducer (e.g. the first
    * stage feeds a memory-heavy downstream per group).
    *
    * Only decomposable, order-free stats are offered (count/min/max):
    * the result is bit-identical to the direct group-by regardless of
    * how the salt splits rows — a double SUM would not be. */
  def saltedStats(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val salted = df.withColumn("__salt",
      pmod(xxhash64(struct(df.columns.map(col): _*)), lit(saltFactor.toLong)))
    salted.groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(count(col(valueCol)).as("__c"),
        min(col(valueCol)).as("__mn"), max(col(valueCol)).as("__mx"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__c")).as("value_count"),
        min(col("__mn")).as("value_min"), max(col("__mx")).as("value_max"))
  }
}
