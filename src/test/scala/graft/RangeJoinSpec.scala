package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Semantics of the bin-bucketed interval join: inclusive bounds, no
  * duplicate matches when an interval spans many bins, parity between
  * the broadcast and shuffle paths. */
class RangeJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def fixtures = {
    import spark.implicits._
    val intervals = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-03 23:59:59")), // 3 bins
      (2L, ts("2024-01-02 12:00:00"), ts("2024-01-02 13:00:00")), // sub-bin
      (3L, ts("2024-02-01 00:00:00"), ts("2024-02-01 00:00:00"))  // degenerate
    ).toDF("iv_id", "lo", "hi")
    val points = Seq(
      (10L, ts("2024-01-01 00:00:00")), // == lo of 1 (inclusive)
      (11L, ts("2024-01-03 23:59:59")), // == hi of 1 (inclusive)
      (12L, ts("2024-01-02 12:30:00")), // inside 1 AND 2
      (13L, ts("2024-01-04 00:00:00")), // just past hi of 1
      (14L, ts("2024-02-01 00:00:00")), // == degenerate interval
      (15L, ts("2024-03-01 00:00:00"))  // matches nothing
    ).toDF("pt_id", "pt")
    (intervals, points)
  }

  test("inclusive bounds, multi-bin intervals don't duplicate, misses drop") {
    val (intervals, points) = fixtures
    val out = RangeJoin.pointInInterval(intervals, points, "lo", "hi", "pt")
      .select("pt_id", "iv_id").orderBy("pt_id", "iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out === Seq((10L, 1L), (11L, 1L), (12L, 1L), (12L, 2L), (14L, 3L)))
  }

  test("shuffle path (broadcastIntervals=false) returns the same rows") {
    val (intervals, points) = fixtures
    val b = RangeJoin.pointInInterval(intervals, points, "lo", "hi", "pt")
    val s = RangeJoin.pointInInterval(intervals, points, "lo", "hi", "pt",
      broadcastIntervals = false)
    assert(b.except(s).count() === 0 && s.except(b).count() === 0)
  }

  test("coarser bins give identical results (residual filter does the work)") {
    val (intervals, points) = fixtures
    val day = RangeJoin.pointInInterval(intervals, points, "lo", "hi", "pt")
    val week = RangeJoin.pointInInterval(intervals, points, "lo", "hi", "pt",
      binSeconds = 7L * 86400)
    assert(day.except(week).count() === 0 && week.except(day).count() === 0)
  }

  test("empty interval table yields empty output, not an error") {
    val (intervals, points) = fixtures
    assert(RangeJoin.pointInInterval(
      intervals.where(lit(false)), points, "lo", "hi", "pt").count() === 0)
  }

  test("salted shuffle path: a hot bin spreads over salts with identical results") {
    import spark.implicits._
    // 200 points piled into ONE day (hot bin) + the fixture intervals
    val (intervals, _) = fixtures
    val hot = (1 to 200).map(i =>
      (i.toLong, new Timestamp(ts("2024-01-02 00:00:00").getTime + i * 60000L)))
      .toDF("pt_id", "pt")
    val plain = RangeJoin.pointInInterval(intervals, hot, "lo", "hi", "pt",
      broadcastIntervals = false)
    val salted = RangeJoin.pointInInterval(intervals, hot, "lo", "hi", "pt",
      broadcastIntervals = false, salts = 8)
    assert(salted.except(plain).count() === 0 && plain.except(salted).count() === 0)
    assert(plain.count() > 0)
    // the salted plan keys its exchange on (bin, salt), not bin alone
    val p = salted.queryExecution.executedPlan.toString
    assert(p.contains("_salt"), p.take(800))

    // degenerate hot bin: ONE repeated timestamp — the salt hashes all
    // point columns, so distinct ids still spread and results hold
    val stamped = (1 to 100).map(i => (i.toLong, ts("2024-01-02 00:00:00")))
      .toDF("pt_id", "pt")
    val sStamped = RangeJoin.pointInInterval(intervals, stamped, "lo", "hi", "pt",
      broadcastIntervals = false, salts = 8)
    assert(sStamped.count() === 100) // all inside interval 1
    val spread = sStamped.select(
      pmod(hash(struct(col("pt_id"), col("pt"))), lit(8))).distinct().count()
    assert(spread > 1, "identical timestamps must still spread across salts")

    // misuse fails loudly: salts with the (default) broadcast path
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(intervals, stamped, "lo", "hi", "pt", salts = 8)
    }
    // collision guard: a caller _salt column is refused, not clobbered
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(intervals, stamped.withColumn("_salt", lit(1)),
        "lo", "hi", "pt", broadcastIntervals = false, salts = 2)
    }
  }

  test("randomized: bin join == naive theta join on 500 points x 40 intervals") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val t0 = ts("2024-01-01 00:00:00").getTime
    def rts(span: Long) = new Timestamp(t0 + (rng.nextDouble() * span).toLong)
    val week = 7L * 86400 * 1000
    val intervals = (1 to 40).map { i =>
      val lo = rts(8 * week)
      // interval lengths from seconds to multiple bins wide
      (i.toLong, lo, new Timestamp(lo.getTime + (rng.nextDouble() * 3 * 86400 * 1000).toLong))
    }.toDF("iv_id", "lo", "hi")
    val points = (1 to 500).map(i => (i.toLong, rts(9 * week))).toDF("pt_id", "pt")
    val got = RangeJoin.pointInInterval(intervals, points, "lo", "hi", "pt")
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
    val want = points.crossJoin(intervals)
      .where(col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(got === want)
    assert(want.nonEmpty, "degenerate fixture: no overlaps generated")
  }
}
