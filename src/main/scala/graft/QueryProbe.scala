package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round profiler (guide §1): for each named query, split
  * wall time into BUILD (DataFrame construction incl. fixture access),
  * PLAN (force the executed plan), and EXEC (noop sink — computes every
  * column of every row, no sink cost, full plan in the SQL tab).
  * Bench's `.count()` methodology stays the driver contract; this main
  * exists so an optimization targets the right phase.
  * Usage: runMain graft.QueryProbe [sfDir] [reps] [query ...]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("SPARK_GRAFT_DISCOVERY_THRESHOLD", "10000"))
      .config("spark.ui.enabled", "false")
    // hypothesis testing: SPARK_PROBE_CONF="k=v;k=v" extra session
    // confs; segments without '=' (a trailing ';', a stray token) are
    // ignored instead of throwing at startup
    val spark = sys.env.get("SPARK_PROBE_CONF").toSeq
      .flatMap(_.split(";")).map(_.split("=", 2)).filter(_.length == 2)
      .foldLeft(b0) { (b, kv) => b.config(kv(0).trim, kv(1).trim) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def ns[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    // task accounting: wall − Σtask/cores ≈ driver-side overhead
    val nJobs = new java.util.concurrent.atomic.AtomicInteger
    val nStages = new java.util.concurrent.atomic.AtomicInteger
    val nTasks = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          nJobs.incrementAndGet()
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          nStages.incrementAndGet()
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          nTasks.incrementAndGet()
          if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
        }
      })
    def resetCounters(): Unit = {
      nJobs.set(0); nStages.set(0); nTasks.set(0); taskMs.set(0)
    }
    import org.apache.spark.metrics.source.CodegenMetrics
    def compSnap(): (Long, Long, Long) = (
      CodegenMetrics.METRIC_COMPILATION_TIME.getCount,
      CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum,
      CodegenMetrics.METRIC_GENERATED_METHOD_BYTECODE_SIZE.getCount)
    names.foreach { n =>
      // untimed warm-up rep: fixtures + codegen
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case e: Throwable =>
        println(f"$n%-28s WARMUP-FAIL ${e.getMessage}"); }
      // a genuinely failing query prints a FAIL row and the probe
      // moves on — one broken query must not abort the whole sweep
      try {
        val rows = (0 until reps).map { _ =>
          val (tb, df) = ns(SparkEntry.queries(n)(spark, sfDir))
          val (tp, _) = ns(df.queryExecution.executedPlan)
          spark.sparkContext.setJobDescription(s"probe:$n")
          resetCounters()
          val c0 = compSnap()
          val (te, _) = ns(
            df.write.format("noop").mode("overwrite").save())
          val c1 = compSnap()
          val acct = (nJobs.get, nStages.get, nTasks.get, taskMs.get,
            c1._1 - c0._1, c1._3 - c0._3)
          spark.sparkContext.setJobDescription(null)
          val (tc, _) = ns(
            SparkEntry.queries(n)(spark, sfDir).count())
          (tb, tp, te, tc, acct)
        }
        def med(xs: Seq[Double]) = Bench.median(xs)
        val a = rows.last._5
        // min = the uncontended floor — the noise-robust A/B statistic on
        // a machine with bursty co-tenant load (ambient spikes only ever
        // ADD time)
        println(f"$n%-28s build=${med(rows.map(_._1))}%.3f plan=${med(rows.map(_._2))}%.3f exec=${med(rows.map(_._3))}%.3f count=${med(rows.map(_._4))}%.3f minExec=${rows.map(_._3).min}%.3f minCount=${rows.map(_._4).min}%.3f jobs=${a._1} stages=${a._2} tasks=${a._3} taskSec=${a._4 / 1000.0}%.2f compiles=${a._5} methods=${a._6}")
      } catch { case e: Throwable =>
        spark.sparkContext.setJobDescription(null)
        println(f"$n%-28s FAIL ${Option(e.getMessage).getOrElse(e.getClass.getName)}")
      }
    }
    spark.stop()
  }
}
