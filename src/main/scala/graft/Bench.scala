package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registry query at `SPARK_GRAFT_SF_DIR`,
  * prints ONE JSON line with per-query seconds. A failing query is
  * REPORTED (per-query `errors` entry + non-zero exit), never silently
  * timed as a fast no-op — a regression must not hide in a good total.
  *
  * Each query runs `SPARK_GRAFT_REPS` times (default 3) and reports the
  * per-query MEDIAN; single-run numbers at these sizes swing ±20% with
  * container load and suite ordering (BENCHNOTES), which round 2 paid
  * for in phantom "regressions". `value` = sum of medians. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: absorb codegen/JIT/classloading so the first timed
    // query measures the query, not session startup
    try {
      spark.range(1000000L).selectExpr("sum(id)").collect()
      SparkEntry.entry(spark).count()
    } catch { case _: Throwable => () }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val runs = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        val err: Option[String] =
          try { fn(spark, sfDir).count(); None }
          catch { case e: Throwable =>
            Some(Option(e.getMessage).getOrElse(e.getClass.getName)) }
        ((System.nanoTime() - t0) / 1e9, err)
      }
      // A failing rep can exit far faster than a real run and would drag
      // the median below the query's true cost — time successful reps
      // only (all-failed queries fall back to the failure timings, whose
      // cost is then the honest number for a query that never succeeds).
      val ok = runs.filter(_._2.isEmpty)
      val timed = if (ok.nonEmpty) ok else runs
      name -> (median(timed.map(_._1)), runs.flatMap(_._2).headOption,
        runs.count(_._2.isDefined))
    }
    // truncate BEFORE escaping (a cut through the middle of an escape
    // sequence would emit invalid JSON), then escape EVERY control char
    // < 0x20 — JSON forbids them all raw, not just \n\r\t
    def jstr(s: String): String = "\"" + s.take(160).flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qs = results.map { case (k, (v, _, _)) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, (_, Some(m), _)) => jstr(k) + ":" + jstr(m) }
      .mkString("{", ",", "}")
    val failedReps = results.collect { case (k, (_, _, n)) if n > 0 => jstr(k) + ":" + n }
      .mkString("{", ",", "}")
    val total = results.values.map(_._1).sum
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"failed_reps":$failedReps,"reps":$reps,"sf":"$sfDir"}"""
    // The harness keeps only the LAST ~2000 bytes of stdout and parses
    // the LAST line. At 92 queries × full double precision the one-line
    // JSON is ~2.7 KB, so the retained tail starts mid-line and the
    // parse fails (BENCH_r01-r04 all recorded `parsed: null`). So: full
    // precision goes to a file + a first stdout line, and the FINAL
    // line is a compact summary built under a hard character budget —
    // slowest queries first at millisecond precision, the remainder
    // folded into `omitted_n`/`omitted_sum`.
    def r3(v: Double): String = java.lang.String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val budget = 1300
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    var used = 0
    var omitted = 0
    var omittedSum = 0.0
    results.toSeq.sortBy(-_._2._1).foreach { case (k, (v, _, _)) =>
      val e = jstr(k) + ":" + r3(v)
      if (used + e.length + 1 <= budget) { entries += e; used += e.length + 1 }
      else { omitted += 1; omittedSum += v }
    }
    val errsCompact = results.toSeq
      .collect { case (k, (_, Some(m), _)) => jstr(k) + ":" + jstr(m.take(60)) }
      .take(3).mkString("{", ",", "}")
    val nErrs = results.values.count(_._2.isDefined)
    val nFailedReps = results.values.count(_._3 > 0)
    val compactLine =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":${entries.mkString("{", ",", "}")},"omitted_n":$omitted,"omitted_sum":${r3(omittedSum)},"errors":$errsCompact,"errors_n":$nErrs,"failed_reps_n":$nFailedReps,"reps":$reps,"n_queries":${results.size},"sf":"$sfDir","detail":"BENCH_FULL.json"}"""
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(
          sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")),
        (fullLine + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () } // cwd may be unwritable; stdout still carries it
    // Emit the JSON lines LAST, after the session is down and its logging
    // silenced: Spark's shutdown INFO logs go to stderr and interleave
    // arbitrarily with stdout in a combined capture, which can bury the
    // line mid-stream for a tail-reading harness (BENCH_r01/r02 both
    // recorded `parsed: None` with a log-noise tail).
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    println(fullLine)
    println(compactLine)
    System.out.flush()
    if (results.values.exists(_._2.isDefined)) sys.exit(1)
  }
}
