package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomJoin

/** The bloom pre-filter must be pure pruning: bloom+exact ≡ plain semi
  * join (row-identical), bloom-only is a superset of the true matches,
  * and `might_contain` runs as a codegen'd predicate on the probe scan
  * side, before the exact join. */
class BloomJoinSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def probe = Tables.lineitem(spark, dir)
  private def build = Tables.orders(spark, dir)
    .where(col("o_totalprice") > 400000.0).select("o_orderkey")

  test("bloom semi-join is row-identical to the plain semi join") {
    val viaBloom = BloomJoin.semiJoin(probe, "l_orderkey", build, "o_orderkey",
      estItems = 10000L, numBits = 65536L)
      .select("l_orderkey", "l_linenumber")
    val keys = build.select(col("o_orderkey").as("k")).distinct()
    val plain = probe.join(keys, probe("l_orderkey") === keys("k"), "left_semi")
      .select("l_orderkey", "l_linenumber")
    assert(viaBloom.exceptAll(plain).isEmpty && plain.exceptAll(viaBloom).isEmpty)
  }

  test("bloom-only filter admits every true match (no false negatives)") {
    val sketch = BloomJoin.buildSketch(build, "o_orderkey", 10000L, 65536L)
    val bloomOnly = probe.where(BloomJoin.mightContain(sketch, col("l_orderkey")))
      .select("l_orderkey").distinct()
    val truth = build.select(col("o_orderkey").as("l_orderkey")).distinct()
      .join(probe.select("l_orderkey").distinct(), Seq("l_orderkey"), "left_semi")
    assert(truth.exceptAll(bloomOnly).isEmpty,
      "a key present in the build side must always pass the bloom")
  }

  test("a tight sketch still prunes most non-matching probe rows") {
    val sketch = BloomJoin.buildSketch(build, "o_orderkey", 10000L, 65536L)
    val total = probe.count()
    val passed = probe.where(BloomJoin.mightContain(sketch, col("l_orderkey"))).count()
    val trueMatches = BloomJoin.semiJoin(probe, "l_orderkey", build, "o_orderkey",
      estItems = 10000L, numBits = 65536L).count()
    assert(passed < total, "the bloom must prune something on selective builds")
    // false-positive rows = passed - trueMatches; with 64Kib for ~600
    // keys the fpp is well under 1%, so the pass-through should hug the
    // true match count (loose 2x bound to stay robust to data drift)
    assert(passed <= trueMatches * 2 + total / 50,
      s"bloom passed $passed vs $trueMatches true matches out of $total")
  }

  test("might_contain is applied probe-side before the exact join") {
    val p = BloomJoin.semiJoin(probe, "l_orderkey", build, "o_orderkey",
      estItems = 10000L, numBits = 65536L)
      .queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), p.take(800))
    val joinIdx = math.max(p.indexOf("SortMergeJoin"),
      math.max(p.indexOf("BroadcastHashJoin"), p.indexOf("ShuffledHashJoin")))
    val mcIdx = p.indexOf("might_contain")
    assert(joinIdx >= 0 && mcIdx > joinIdx,
      "the bloom filter must sit below the join in the plan tree (printed after it)")
  }
}
