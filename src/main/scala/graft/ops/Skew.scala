package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §7.5; builder north star:
  * "salting for skew, AQE for runtime re-plan").
  *
  * AQE's skew-join split handles sort-merge skew automatically, but it
  * cannot help when the skewed side feeds an AGGREGATION (one hot key
  * → one reducer) or when a hash join's build side is fine but the
  * probe side piles one key into one task. Salting is the manual
  * lever: spread a hot key over `salts` sub-keys, replicate the other
  * side across all salt values, and (for aggregations) re-combine with
  * a second, tiny aggregation over the pre-combined partials.
  */
object Skew {

  /** Deterministic salt in [0, salts): hash of a discriminator column
    * (NOT rand() — a retried task must salt a row identically, or
    * shuffle replays double-count under speculative execution).
    */
  def salt(discriminator: Column, salts: Int): Column =
    pmod(hash(discriminator), lit(salts))

  /** Inner equi-join where `skewed`'s join key is heavily repeated:
    * the skewed side gets a per-row salt from a high-cardinality
    * discriminator; `other` is replicated `salts`× (explode of a
    * constant range) so every (key, salt) bucket finds its match.
    * Result set is row-identical to the unsalted join; the shuffle
    * spreads each hot key over `salts` tasks.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
      discriminator: String, salts: Int): DataFrame = {
    val s = skewed.withColumn("__salt", salt(col(discriminator), salts))
    val o = other.withColumn("__salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    s.join(o, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: count/sum partials
    * per (key, salt), then combine the ≤`salts` partials per key.
    * The hot key's first-phase work spreads over `salts` reducers; the
    * second phase touches only pre-combined rows. Decimal-exact (sum
    * order across partials cannot change the result).
    *
    * Measured (BASELINE.md r5, 4 M rows / 40 % hot key): for ALGEBRAIC
    * aggs like this sum/count pair the technique is a wash — Spark's
    * map-side partial aggregation already collapses the hot key before
    * the shuffle. It pays when the aggregate is holistic
    * (collect_list/percentile/distinct-heavy), where partials cannot
    * pre-combine and one reducer would hold the hot key's every row.
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: Column,
      discriminator: String, salts: Int): DataFrame =
    df.withColumn("__salt", salt(col(discriminator), salts))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("sum_value"), sum(col("__pcnt")).as("n"))
}
