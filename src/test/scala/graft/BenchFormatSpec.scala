package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness keeps only the LAST ~2000 bytes of stdout and
  * parses the last line, so the compact summary line must stay under
  * that ceiling NO MATTER how large the registry grows (BENCH_r01-r04
  * were all lost to an oversized line). Pure-function tests — no Spark
  * session. */
class BenchFormatSpec extends AnyFunSuite {
  import Bench.{QueryResult, formatLines}

  private def synthetic(n: Int): Seq[(String, QueryResult)] =
    (0 until n).map { i =>
      // realistic worst-case names: long, and timings with full double noise
      (f"q_exact_substring_boilerplate_family_$i%03d",
        QueryResult(0.123456789 * (i + 1), None, 0))
    }

  test("compact line stays under 1900 bytes at 150 registry queries") {
    val (_, compact) = formatLines(synthetic(150), reps = 3,
      sfDir = "/root/testdata/sf0.1", loadavg = (12.34, 56.78))
    assert(compact.getBytes("UTF-8").length < 1900,
      s"compact line is ${compact.length} bytes:\n$compact")
    // and it still parses as one JSON object with the headline fields
    assert(compact.startsWith("{") && compact.endsWith("}"))
    assert(compact.contains("\"metric\":\"total\""))
    assert(compact.contains("\"n_queries\":150"))
    assert(compact.contains("\"loadavg\":[12.340,56.780]"))
    // dropped queries are accounted for, not silently vanished
    assert(compact.contains("\"omitted_n\":"))
  }

  test("the line self-adjudicates contention, net of the bench's own load") {
    val rs = synthetic(10)
    val (fullHot, compactHot) = formatLines(rs, 3, "sf", (3.7, 4.1))
    assert(fullHot.contains("\"contended\":true") &&
      compactHot.contains("\"contended\":true"))
    // heavy load ARRIVING mid-run still flags: the end sample exceeds
    // threshold + cpus, which the bench's own threads cannot produce
    val (fullEnd, _) = formatLines(rs, 3, "sf", (0.5, 7.1), cpus = 4)
    assert(fullEnd.contains("\"contended\":true"),
      "load arriving mid-run must still flag the artifact")
    // the self-load allowance is DURATION-AWARE: over a 47 s run
    // local[4] can push the 1-minute EWMA to at most 4·(1−e^(−47/60))
    // ≈ 2.2, so an end sample of 4.5 — under a flat threshold+cpus —
    // is still evidence of external load on a short run
    val (fullShort, _) =
      formatLines(rs, 3, "sf", (0.3, 4.5), cpus = 4, elapsedSec = 47)
    assert(fullShort.contains("\"contended\":true"),
      "a flat +cpus allowance would hide contention joining a short run")
    // ...while the same end sample on a long run is within self-load
    val (fullLong, _) =
      formatLines(rs, 3, "sf", (0.3, 4.5), cpus = 4, elapsedSec = 600)
    assert(fullLong.contains("\"contended\":false"),
      "a long run earns (asymptotically) the full +cpus allowance")
    // the bench's own multi-minute local[4] run drives the 1-minute
    // loadavg past a bare threshold by itself — that is NOT contention
    // (the either-sample rule self-flagged every clean run)
    val (fullSelf, compactSelf) = formatLines(rs, 3, "sf", (0.29, 2.44), cpus = 4)
    assert(fullSelf.contains("\"contended\":false") &&
      compactSelf.contains("\"contended\":false"),
      "self-load at the end sample must not flag a clean run")
    val (fullCold, compactCold) = formatLines(rs, 3, "sf", (0.78, 1.2))
    assert(fullCold.contains("\"contended\":false") &&
      compactCold.contains("\"contended\":false"))
    val (fullCustom, _) = formatLines(rs, 3, "sf", (5.0, 5.0), loadThreshold = 8.0)
    assert(fullCustom.contains("\"contended\":false"),
      "threshold is configurable (SPARK_GRAFT_LOAD_THRESHOLD)")
  }

  test("compact line carries errors and failed-rep counts without blowing the budget") {
    val errs = synthetic(150).map { case (k, r) =>
      k -> r.copy(err = Some("boom: " + "x" * 500), failedReps = 2)
    }
    val (_, compact) = formatLines(errs, reps = 3, sfDir = "sf", loadavg = (0.0, 0.0))
    assert(compact.getBytes("UTF-8").length < 1900)
    assert(compact.contains("\"errors_n\":150"))
    assert(compact.contains("\"failed_reps_n\":150"))
  }

  test("omitted_sum folds exactly the timings that fell off the compact line") {
    val rs = synthetic(150)
    val (_, compact) = formatLines(rs, 3, "sf", (0.0, 0.0))
    val omittedN = """"omitted_n":(\d+)""".r.findFirstMatchIn(compact).get.group(1).toInt
    val omittedSum = """"omitted_sum":([0-9.]+)""".r.findFirstMatchIn(compact).get.group(1).toDouble
    assert(omittedN > 0, "150 queries must overflow the budget")
    // slowest-first packing ⇒ the omitted set is the fastest omittedN
    val expected = rs.map(_._2.sec).sorted.take(omittedN).sum
    assert(math.abs(omittedSum - expected) < 1e-3)
  }

  test("full line keeps full precision and every query") {
    val rs = synthetic(150)
    val (full, _) = formatLines(rs, 3, "sf", (0.0, 0.0))
    assert(rs.forall { case (k, _) => full.contains("\"" + k + "\"") })
    assert(full.contains(rs.head._2.sec.toString))
  }

  test("dispersion stamp: full line carries per-query spread; both lines count the unstable set") {
    val stable = ("q_stable", QueryResult(1.0, None, 0, spread = 0.1))
    val noisy = ("q_noisy", QueryResult(1.0, None, 0, spread = 0.92))
    val (full, compact) = formatLines(Seq(stable, noisy), reps = 3,
      sfDir = "sf", loadavg = (0.0, 0.0), tailReps = 4)
    assert(full.contains(""""spread":{"q_stable":0.100,"q_noisy":0.920}"""))
    // unstable = spread past 50% of median: a same-machine 1.5×
    // comparison inside that band is noise, not regression
    assert(full.contains("\"unstable_n\":1"))
    assert(compact.contains("\"unstable_n\":1"))
    assert(full.contains("\"tail_reps\":4") && compact.contains("\"tail_reps\":4"))
    // and the budget still holds with the new fields at 150 queries
    val big = synthetic(150).map { case (k, r) => k -> r.copy(spread = 0.777) }
    val (_, c2) = formatLines(big, 3, "/root/testdata/sf0.1", (0.0, 0.0), tailReps = 4)
    assert(c2.getBytes("UTF-8").length < 1900, s"${c2.length} bytes")
  }

  test("spreadOf: (max-min)/median, 0 for degenerate input") {
    assert(Bench.spreadOf(Seq(1.0)) === 0.0)
    assert(Bench.spreadOf(Nil) === 0.0)
    assert(math.abs(Bench.spreadOf(Seq(0.8, 1.0, 1.4)) - 0.6) < 1e-9)
    assert(Bench.spreadOf(Seq(0.0, 0.0)) === 0.0)
  }

  test("summarize: warm-up reps never reach medians; spread covers all timed passes once warmed") {
    // the untimed warm-up pass is excluded STRUCTURALLY — summarize
    // only ever sees timed passes — so the pin here is the two
    // dispersion modes: warmed (all timed passes count toward spread)
    // vs unwarmed (pass 0 pays one-time builds, excluded from spread,
    // the pre-round-11 behavior)
    def pass(v: Double): Map[String, (Double, Option[String])] =
      Map("q" -> ((v, None)))
    // warmed: passes [1.0, 1.2, 0.8] — spread over all three
    val warmed = Bench.summarize(Seq("q"),
      Seq(pass(1.0), pass(1.2), pass(0.8)), Nil, warmedUp = true)
    assert(warmed.head._2.sec === 1.0)
    assert(math.abs(warmed.head._2.spread - 0.4) < 1e-9)
    // unwarmed: pass 0 is a 9s fixture build — the MEDIAN rejects it
    // (middle of [9, 1.2, 0.8] is 1.2) and the spread must not see it
    val unwarmed = Bench.summarize(Seq("q"),
      Seq(pass(9.0), pass(1.2), pass(0.8)), Nil, warmedUp = false)
    assert(unwarmed.head._2.sec === 1.2)
    assert(math.abs(unwarmed.head._2.spread - (1.2 - 0.8) / 1.0) < 1e-9)
    // failures never enter the median while any pass succeeded, and
    // tail passes extend both the median and the spread
    val withTail = Bench.summarize(Seq("q"),
      Seq(Map("q" -> ((0.1, Some("boom")))), pass(1.0), pass(1.2)),
      Seq(pass(0.8), pass(1.4)), warmedUp = true)
    assert(withTail.head._2.sec === 1.1)
    assert(withTail.head._2.failedReps === 1)
    assert(withTail.head._2.err === Some("boom"))
    assert(math.abs(withTail.head._2.spread - (1.4 - 0.8) / 1.1) < 1e-9)
  }

  test("task_sec accounting: summarize medians per-query task time; both lines carry it") {
    // taskSec is the parallel-work evidence (suspect_cpus_ignored
    // clearance): full line carries the per-query map, compact line the
    // total — additions-only to both shapes
    def pass(v: Double): Map[String, (Double, Option[String])] =
      Map("q" -> ((v, None)))
    val rs = Bench.summarize(Seq("q"),
      Seq(pass(1.0), pass(1.2), pass(0.8)), Nil, warmedUp = true,
      taskSecs = Map("q" -> Seq(4.0, 4.4, 3.6)))
    assert(rs.head._2.taskSec === 4.0)
    // absent accounting stays 0.0 (a failing query records no sample)
    val none = Bench.summarize(Seq("q"),
      Seq(pass(1.0)), Nil, warmedUp = true)
    assert(none.head._2.taskSec === 0.0)
    val (full, compact) = formatLines(
      Seq(("q_a", QueryResult(1.0, None, 0, taskSec = 4.0)),
        ("q_b", QueryResult(0.5, None, 0, taskSec = 1.25))),
      reps = 3, sfDir = "sf", loadavg = (0.0, 0.0))
    assert(full.contains(""""task_sec":{"q_a":4.000,"q_b":1.250}"""))
    assert(full.contains(""""task_sec_total":5.250"""))
    assert(compact.contains(""""task_sec_total":5.250"""))
    // the compact budget still holds with the new field at 150 queries
    val (_, c2) = formatLines(synthetic(150).map { case (k, r) =>
      k -> r.copy(taskSec = 12.345) }, 3, "/root/testdata/sf0.1", (0.0, 0.0))
    assert(c2.getBytes("UTF-8").length < 1900, s"${c2.length} bytes")
  }

  test("median is the middle of odd runs, mean-of-middle for even") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) === 2.0)
    assert(Bench.median(Seq(4.0, 1.0, 2.0, 3.0)) === 2.5)
  }

  test("jstr escapes control chars and truncates before escaping") {
    assert(Bench.jstr("a\"b\\c\nd") === "\"a\\\"b\\\\c\\u000ad\"")
    val long = "\\" * 200
    val out = Bench.jstr(long)
    // 160 backslashes escape to 320 chars + quotes — never a dangling escape
    assert(out === "\"" + ("\\\\" * 160) + "\"")
  }
}
