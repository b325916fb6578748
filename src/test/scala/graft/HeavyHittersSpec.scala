package graft

import org.apache.spark.sql.functions._

import graft.expressions.HeavyHittersAggregate.heavyHitters

/** MISRA-GRIES heavy hitters ([[graft.expressions.HeavyHittersAggregate]]):
  * exact in the distinct ≤ capacity regime, bounded-error beyond it, and
  * map-side combinable — the three claims the scaladoc makes, each
  * pinned here (the exact regime is additionally hash-checked against
  * DuckDB by q_heavy_hitters). */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def emitted(df: org.apache.spark.sql.DataFrame) =
    df.select(explode(col("hh")).as("h"))
      .select(col("h.key"), col("h.cnt"), col("h.err"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("exact regime: distinct <= capacity reproduces the exact groupBy, err = 0, deterministic tie order") {
    // Zipf-ish multiplicities over 40 keys, scattered across partitions
    val rows = (0 until 4000).map(i => s"k-${i % 40}")
    val df = rows.toDF("key").repartition(16)
    val out = emitted(df.agg(heavyHitters(col("key"), 64).as("hh")))
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(out.length === 40)
    assert(out.forall(_._3 === 0L), "exact regime must report err = 0")
    out.foreach { case (k, c, _) => assert(exact(k) === c) }
    // sorted (cnt DESC, key ASC): ties (all counts equal here) by key
    assert(out.map(_._1).toSeq ===
      out.map(r => (-r._2, r._1)).sorted.map(_._2).toSeq)
  }

  test("overflow regime: counts underestimate by at most err, err <= N/(capacity+1), and every true heavy hitter survives") {
    // 20 genuinely heavy keys (200 each) drowned in 5000 singletons:
    // distinct = 5020 >> capacity = 64
    val heavy = (0 until 20).flatMap(i => Seq.fill(200)(s"hot-$i"))
    val noise = (0 until 5000).map(i => s"cold-$i")
    val rows = scala.util.Random.shuffle(heavy ++ noise)
    val n = rows.size.toLong
    val cap = 64
    val df = rows.toDF("key").repartition(16)
    val out = emitted(df.agg(heavyHitters(col("key"), cap).as("hh")))
    assert(out.length <= cap)
    val err = out.head._3
    assert(err > 0L, "overflow regime must report a non-zero bound")
    assert(err <= n / (cap + 1),
      s"err $err exceeds the MG bound ${n / (cap + 1)}")
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    out.foreach { case (k, c, e) =>
      assert(c <= exact(k), s"$k overcounted: stored $c > true ${exact(k)}")
      assert(exact(k) <= c + e, s"$k undercounted past the bound")
    }
    // the MG guarantee: any key with true count > N/(cap+1) is retained
    val retained = out.map(_._1).toSet
    (0 until 20).foreach(i => assert(retained.contains(s"hot-$i"),
      s"true heavy hitter hot-$i was evicted"))
  }

  test("map-side partial aggregation: the sketch, not the key universe, crosses the shuffle") {
    val df = (0 until 1000).map(i => s"k-${i % 10}").toDF("key")
      .repartition(8)
      .agg(heavyHitters(col("key"), 16).as("hh"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("heavy_hitters"))
    // two-phase typed aggregate: a partial pass before the exchange
    assert(plan.contains("partial_heavy_hitters") ||
      plan.contains("Partial"), s"no partial phase in:\n$plan")
  }

  test("per-group heavy hitters: the aggregate composes with groupBy like any other") {
    val df = (0 until 900).map(i => (s"g${i % 3}", s"k-${i % 9}"))
      .toDF("grp", "key").repartition(8)
    val out = df.groupBy("grp")
      .agg(heavyHitters(col("key"), 16).as("hh"))
      .select(col("grp"), explode(col("hh")).as("h"))
      .select(col("grp"), col("h.key"), col("h.cnt"), col("h.err"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    // each group sees 3 of the 9 keys (i%9 fixes i%3), 100 each, exact
    assert(out.size === 9)
    out.foreach { case (_, (cnt, err)) =>
      assert(cnt === 100L && err === 0L)
    }
  }

  test("SQL face: heavy_hitters(key, capacity) registers like the other kernels") {
    graft.functions.GraftFunctions.register(spark)
    (0 until 600).map(i => s"t-${i % 6}").toDF("key")
      .createOrReplaceTempView("hh_input")
    val out = spark.sql(
      """SELECT h.key, h.cnt, h.err
         FROM (SELECT explode(heavy_hitters(key, 8)) AS h FROM hh_input)
         ORDER BY h.key""").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === (0 until 6).map(i => (s"t-$i", 100L, 0L)))
  }

  test("nulls are skipped; empty input emits an empty array") {
    val out = Seq(Some("a"), None, Some("a"), None).toDF("key")
      .agg(heavyHitters(col("key"), 4).as("hh"))
    assert(emitted(out).toSeq === Seq(("a", 2L, 0L)))
    val empty = Seq.empty[String].toDF("key")
      .agg(heavyHitters(col("key"), 4).as("hh"))
    assert(empty.select(size(col("hh"))).head().getInt(0) === 0)
  }
}
