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

  test("Spark's own runtime bloom filter injects on this join shape when thresholds allow") {
    // the explicit BloomJoin operator exists because these thresholds
    // are a CBO gamble — but when they DO line up, the same fact-fact
    // shape must pick up InjectRuntimeFilter's bloom with no code
    // change (proves the queries compose with Spark's runtime
    // filtering rather than fighting it)
    val c = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> c.getOption(k))
    try {
      c.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      c.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
      val li = Tables.lineitem(spark, dir)
      val o = Tables.orders(spark, dir).where(col("o_totalprice") > 400000.0)
      val p = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("l_returnflag").count()
        .queryExecution.executedPlan.toString
      assert(p.contains("might_contain"),
        s"expected an injected runtime bloom filter:\n${p.take(1500)}")
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None) => c.unset(k)
    }
  }

  test("the build relation is scanned exactly once per semiJoin call") {
    import spark.implicits._
    // count every row the build plan actually produces: if the sketch
    // aggregate and the exact semi-join each re-scanned the build side
    // (the old shape), the accumulator would read 2x
    val acc = spark.sparkContext.longAccumulator("build_rows_read")
    val counted = (1 to 500).map(_.toLong * 2).toDS()
      .map { k => acc.add(1); k }.toDF("bk")
    val probeDf = (1 to 2000).map(_.toLong).toDF("pk")
    val got = BloomJoin.semiJoin(probeDf, "pk", counted, "bk", 10000L, 65536L)
    assert(got.count() === 500L) // evens 2..1000 all appear in 1..2000
    assert(acc.value === 500L,
      s"build side produced ${acc.value} rows — scanned more than once")
  }

  test("an empty build side yields an empty (not failing) result") {
    // BloomFilterAggregate over zero rows evals to NULL; might_contain
    // on a NULL sketch is NULL, which filters every probe row — the
    // correct semi-join answer for an empty build side, reached without
    // a special case
    val empty = build.where(lit(false))
    val out = BloomJoin.semiJoin(probe, "l_orderkey", empty, "o_orderkey",
      estItems = 100L, numBits = 8192L)
    assert(out.count() === 0L)
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
