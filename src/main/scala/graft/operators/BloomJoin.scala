package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Explicit bloom-filter semi-join — the fact-fact join pre-filter that
  * makes a selective join survive 100 TB.
  *
  * Shape: aggregate the (filtered, small-ish) build side's join keys
  * into ONE bloom sketch (`BloomFilterAggregate`, map-side combinable,
  * the sketch — not the data — reaches the driver), then prune the huge
  * probe side with a codegen'd `might_contain` BEFORE its shuffle, then
  * run the exact join to kill the bloom's false positives. The result
  * is bit-identical to the plain join — the bloom is pure pruning — so
  * the operator stays oracle-pairable.
  *
  * This is what Spark's own `InjectRuntimeFilter` does automatically,
  * but only when CBO size thresholds line up
  * (`spark.sql.optimizer.runtime.bloomFilter.*`); the explicit operator
  * applies the pattern unconditionally and composes with any plan. The
  * driver-side `head()` pulls a KB-to-MB sketch, never rows — the same
  * posture as Spark's scalar-subquery runtime filter and the IVF
  * centroid pull.
  *
  * The reference has no join surface at all (its metadata filtering is
  * in-process pandas, /root/reference/vector_lake/core/frame.py); this
  * is north-star scale infrastructure, not a port.
  */
object BloomJoin {

  /** `bloom_filter_agg(xxhash64(key))` as a Column (not exposed via
    * public functions in Spark 4.1). */
  def bloomAgg(key: Column, estItems: Long, numBits: Long): Column =
    GraftShims.column(new BloomFilterAggregate(
      new XxHash64(Seq(GraftShims.expression(key))),
      Literal(estItems), Literal(numBits)).toAggregateExpression())

  /** Collect the build side's keys into one serialized bloom sketch. */
  def buildSketch(build: DataFrame, key: String,
      estItems: Long, numBits: Long): Array[Byte] =
    build.agg(bloomAgg(col(key), estItems, numBits).as("bf"))
      .head().getAs[Array[Byte]](0)

  /** `might_contain(<sketch literal>, xxhash64(key))` — codegen'd,
    * pushable to the probe-side scan stage (it is a deterministic
    * predicate on one column). */
  def mightContain(sketch: Array[Byte], key: Column): Column =
    GraftShims.column(BloomFilterMightContain(
      Literal(sketch, BinaryType),
      new XxHash64(Seq(GraftShims.expression(key)))))

  /** Exact LEFT SEMI join with bloom pre-pruning: returns exactly the
    * probe rows whose `probeKey` appears in `build.buildKey`, with the
    * bloom cutting non-matching probe rows before the exact join's
    * shuffle. `estItems`/`numBits` size the sketch (defaults: 1M keys
    * at 8 bits/key ≈ 2% fpp, a 1 MB broadcast).
    *
    * The build relation is scanned ONCE: its distinct key set is
    * materialized ([[Materialize.cut]]) and feeds BOTH the sketch
    * aggregate and the exact semi-join — previously the sketch and the
    * join each re-scanned the build plan, which at 100 TB doubles the
    * cost of exactly the side this operator exists to keep cheap. */
  def semiJoin(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String,
      estItems: Long = 1000000L, numBits: Long = 8388608L): DataFrame = {
    val keys = Materialize.cut(
      build.select(col(buildKey).as("__bloom_bk")).distinct())
    val sketch = buildSketch(keys, "__bloom_bk", estItems, numBits)
    val pruned = probe.where(mightContain(sketch, col(probeKey)))
    pruned.join(keys, pruned(probeKey) === keys("__bloom_bk"), "left_semi")
  }
}
