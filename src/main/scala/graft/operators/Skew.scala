package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the manual tools for when AQE's
  * runtime skew-join splitting isn't available (aggregations, or
  * deliberately pinned plans).
  *
  * Salting pattern: explode one hot key into `salts` sub-keys so the
  * shuffle spreads a hot partition across executors, then reduce the
  * salted partials. Deterministic: the salt derives from a stable hash
  * of provided columns, never from randomness, so results are
  * reproducible (and agg results are exactly the unsalted ones for
  * reassociative aggregates).
  */
object Skew {

  /** Two-phase salted aggregation: groupBy(keys + salt) partial, then
    * groupBy(keys) final. `aggs` maps output column name → (partialAgg,
    * finalAgg) builders, e.g. count → (count, sum). */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltFrom: Column,
      salts: Int,
      partial: Map[String, Column => Column],
      finals: Map[String, Column => Column],
      valueCol: String): DataFrame = {
    require(partial.keySet == finals.keySet, "partial/final agg keys must match")
    val salted = df.withColumn("_salt", pmod(hash(saltFrom), lit(salts)))
    val p = salted.groupBy((keys :+ "_salt").map(col): _*)
      .agg(partial.head._2(col(valueCol)).as(partial.head._1),
        partial.tail.map { case (n, f) => f(col(valueCol)).as(n) }.toSeq: _*)
    p.groupBy(keys.map(col): _*)
      .agg(finals.head._2(col(finals.head._1)).as(finals.head._1),
        finals.tail.map { case (n, f) => f(col(n)).as(n) }.toSeq: _*)
  }

  /** Salted broadcast-free join for a skewed LEFT side against a small
    * RIGHT side: left rows get a deterministic salt in [0, salts); the
    * right side is replicated `salts` times so every (key, salt) bucket
    * finds its match. Spreads one hot key over `salts` shuffle
    * partitions at the cost of replicating the small side. */
  def saltedJoin(
      bigLeft: DataFrame,
      smallRight: DataFrame,
      key: String,
      salts: Int,
      saltFrom: Column): DataFrame = {
    val l = bigLeft.withColumn("_salt", pmod(hash(saltFrom), lit(salts)))
    val r = smallRight.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
