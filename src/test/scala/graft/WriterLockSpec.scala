package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Fail-fast single-writer gate: every mutating op (ingest, deleteWhere,
  * upsert, compact) takes an atomic `_lock` marker under the lake root
  * and a concurrent mutation THROWS instead of silently losing the
  * race — the beat-the-reference posture (its sync is last-persist-wins,
  * index.py:294-308). Readers never see the lock; vacuum removes a
  * stale one after a writer crash. */
class WriterLockSpec extends SparkSpec {
  import spark.implicits._

  private def freshLake(): Lake = {
    val dir = Files.createTempDirectory("graft_lock_test").toString
    Lake(spark, LakeConfig(s"$dir/lake", dim = 5, numHashes = 4))
  }

  private def seed(lake: Lake, n: Int = 16): Unit = {
    val rng = new scala.util.Random(7)
    lake.ingest((0 until n).map { i =>
      (s"r$i", Seq.fill(5)(rng.nextGaussian().toFloat), s"doc $i")
    }.toDF("id", "vector", "document"))
  }

  private def lockPath(lake: Lake) =
    new org.apache.hadoop.fs.Path(lake.cfg.location, Lake.lockName)

  test("MUTUAL EXCLUSION under contention storm: at most one writer ever inside the lock") {
    // Regression for the local-FS acquisition race: Hadoop's local
    // create(overwrite=false) is check-then-act, so two writers in the
    // window could BOTH pass verify-after-write (the second's create
    // truncates the first's just-written token before the first read it
    // back) — observed as two DML commits rewriting one generation
    // concurrently. The fix acquires through POSIX O_EXCL on file://.
    // This storm drives the window hard: many threads, tiny critical
    // sections, immediate re-tries.
    val lake = freshLake()
    seed(lake)
    val inside = new java.util.concurrent.atomic.AtomicInteger()
    val maxInside = new java.util.concurrent.atomic.AtomicInteger()
    val acquired = new java.util.concurrent.atomic.AtomicInteger()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val tasks = (0 until 8).map { _ =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          gate.await()
          var rounds = 0
          while (rounds < 200) {
            try lake.withWriterLock("stress") {
              val n = inside.incrementAndGet()
              maxInside.getAndAccumulate(n, math.max)
              acquired.incrementAndGet()
              inside.decrementAndGet()
              ()
            } catch {
              case _: java.util.ConcurrentModificationException => ()
            }
            rounds += 1
          }
        }
      })
    }
    gate.countDown()
    tasks.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    assert(maxInside.get() === 1,
      s"writer-lock exclusion broke: ${maxInside.get()} writers inside at once")
    assert(acquired.get() > 0, "storm never acquired — vacuous")
    // the lock never strands: one more mutation goes straight through
    lake.compact()
  }

  private def fsOf(lake: Lake) =
    lockPath(lake).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("every mutating op refuses while another session holds the lock; reads still work") {
    val lake = freshLake()
    seed(lake)
    // a second session mid-op: hold the lock exactly as withWriterLock does
    val fs = fsOf(lake)
    val out = fs.create(lockPath(lake), false)
    out.write("""{"op": "compact", "taken_at": "test"}""".getBytes("UTF-8"))
    out.close()
    try {
      val batch = Seq(("x", Seq(1f, 0f, 0f, 0f, 0f), "d")).toDF("id", "vector", "document")
      val e = intercept[java.util.ConcurrentModificationException](lake.ingest(batch))
      assert(e.getMessage.contains("writer lock"))
      intercept[java.util.ConcurrentModificationException](lake.upsert(batch))
      intercept[java.util.ConcurrentModificationException](
        lake.deleteWhere(col("id") === "r0"))
      intercept[java.util.ConcurrentModificationException](lake.compact())
      // the refused ops changed nothing and the lake stays fully readable
      assert(lake.count() === 16L)
      assert(lake.topKExact(Seq(1.0, 0, 0, 0, 0), 3).count() === 3L)
    } finally fs.delete(lockPath(lake), false)
  }

  test("the lock is released on success AND on op failure") {
    val lake = freshLake()
    seed(lake)
    val fs = fsOf(lake)
    assert(!fs.exists(lockPath(lake)), "seed ingest must release the lock")
    // a failing op (duplicate-id upsert throws mid-body) must not strand it
    val dup = Seq(
      ("d", Seq(1f, 0f, 0f, 0f, 0f), "v1"),
      ("d", Seq(0f, 1f, 0f, 0f, 0f), "v2")).toDF("id", "vector", "document")
    intercept[IllegalArgumentException](lake.upsert(dup))
    assert(!fs.exists(lockPath(lake)), "a failed upsert must release the lock")
    assert(lake.deleteWhere(col("id") === "r0") === 1L)
  }

  test("force-vacuum clears a stale lock but refuses a young one by default") {
    val lake = freshLake()
    seed(lake)
    val fs = fsOf(lake)
    fs.create(lockPath(lake), false).close() // writer died before its finally
    intercept[java.util.ConcurrentModificationException](
      lake.deleteWhere(col("id") === "r1"))
    // non-force vacuum is itself a locked op — it cannot even start
    intercept[java.util.ConcurrentModificationException](lake.vacuum())
    // default age threshold: a young lock is a LIVE-but-slow writer
    // until proven otherwise; silently unlocking it would re-open the
    // lost-update race (round-6 ADVICE)
    val e = intercept[IllegalStateException](lake.vacuum(force = true))
    assert(e.getMessage.contains("LIVE"))
    assert(fs.exists(lockPath(lake)), "a refused force-vacuum must not unlock")
    // operator confirmed the writer is dead: explicit zero threshold
    assert(lake.vacuum(force = true, lockMaxAgeMs = 0L) === 1L)
    assert(!fs.exists(lockPath(lake)))
    assert(lake.deleteWhere(col("id") === "r1") === 1L, "ops recover after vacuum")
  }

  test("concurrent ingests are ADMITTED: parallel loaders all land, no serialization on the lock") {
    val lake = freshLake()
    seed(lake)
    val other = Lake(spark.newSession(), lake.cfg)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val rng = new scala.util.Random(17)
    // 4 concurrent batch appends, two sessions — the shared gate admits
    // them ALL (the exclusive gate would have refused 3 of 4)
    val attempts = (0 until 4).map { i =>
      val target = if (i % 2 == 0) lake else other
      val batch = (0 until 8).map(j =>
        (s"c$i-$j", Seq.fill(5)(rng.nextGaussian().toFloat), s"batch $i row $j"))
        .toDF("id", "vector", "document")
      scala.concurrent.Future { target.ingest(batch); "ok" }
    }
    val outcomes = scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(attempts),
      scala.concurrent.duration.Duration(180, "s"))
    pool.shutdown()
    assert(outcomes === Seq("ok", "ok", "ok", "ok"),
      s"concurrent appends must all be admitted: $outcomes")
    // every row of every batch landed exactly once
    assert(lake.read().where(col("id").startsWith("c")).count() === 32L)
    assert(lake.read().select("id").distinct().count() === lake.count())
    assert(lake.count() === 48L)
    // no marker, no staging scratch survives
    val fs = fsOf(lake)
    val leftovers = fs.listStatus(
      new org.apache.hadoop.fs.Path(lake.cfg.location)).map(_.getPath.getName)
      .filter(n => n.startsWith("_append.") || n == "_staging")
    assert(leftovers.isEmpty, s"scratch left behind: ${leftovers.mkString(", ")}")
  }

  test("maintenance yields to in-flight appends; appends yield to maintenance") {
    val lake = freshLake()
    seed(lake)
    val fs = fsOf(lake)
    // an append in flight: its shared marker is on disk
    val marker = new org.apache.hadoop.fs.Path(lake.cfg.location,
      s"_append.${java.util.UUID.randomUUID()}.lock")
    fs.create(marker, false).close()
    try {
      // every structure-mutating op refuses while the append runs
      val e = intercept[java.util.ConcurrentModificationException](lake.compact())
      assert(e.getMessage.contains("append"))
      intercept[java.util.ConcurrentModificationException](
        lake.deleteWhere(col("id") === "r0"))
      intercept[java.util.ConcurrentModificationException](lake.seal())
      // and none of them left the exclusive lock behind when backing off
      assert(!fs.exists(lockPath(lake)),
        "a maintenance op that yielded to appends must release _lock")
      // another APPEND is still admitted alongside
      lake.ingest(Seq(("x", Seq(1f, 0f, 0f, 0f, 0f), "d"))
        .toDF("id", "vector", "document"))
      assert(lake.read().where(col("id") === "x").count() === 1L)
    } finally fs.delete(marker, false)
    // marker gone: maintenance proceeds again
    assert(lake.deleteWhere(col("id") === "r0") === 1L)
    // force-vacuum treats a stranded young marker as a LIVE appender
    fs.create(marker, false).close()
    val e2 = intercept[IllegalStateException](lake.vacuum(force = true))
    assert(e2.getMessage.contains("LIVE") || e2.getMessage.contains("appender"))
    // operator-confirmed dead: cleared with the explicit zero threshold
    assert(lake.vacuum(force = true, lockMaxAgeMs = 0L) >= 1L)
    assert(!fs.exists(marker))
  }

  test("a refused force-vacuum deletes NOTHING: the stale lock survives a young append marker") {
    val lake = freshLake()
    seed(lake)
    val fs = fsOf(lake)
    // a genuinely stale _lock (mtime pushed 1h back)...
    fs.create(lockPath(lake), false).close()
    fs.setTimes(lockPath(lake), System.currentTimeMillis() - 3600000L, -1L)
    // ...next to a FRESH append marker (a live appender)
    val marker = new org.apache.hadoop.fs.Path(lake.cfg.location,
      s"_append.${java.util.UUID.randomUUID()}.lock")
    fs.create(marker, false).close()
    try {
      // the young marker refuses the whole force-vacuum — and the
      // refusal must be ATOMIC: the stale lock it would have cleared is
      // untouched (deleting it first, then throwing, would mutate lock
      // state while reporting "nothing happened")
      val e = intercept[IllegalStateException](lake.vacuum(force = true))
      assert(e.getMessage.contains("appender"))
      assert(fs.exists(lockPath(lake)),
        "refused force-vacuum must not have deleted the stale _lock")
      assert(fs.exists(marker))
      // operator-confirmed dead: one call clears both, counted
      assert(lake.vacuum(force = true, lockMaxAgeMs = 0L) >= 2L)
      assert(!fs.exists(lockPath(lake)) && !fs.exists(marker))
    } finally { fs.delete(marker, false); fs.delete(lockPath(lake), false) }
    assert(lake.deleteWhere(col("id") === "r0") === 1L, "ops recover")
  }

  test("two sessions racing mutations: losers throw, invariants hold") {
    val lake = freshLake()
    seed(lake)
    val other = Lake(spark.newSession(), lake.cfg) // same lake, second session
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val rng = new scala.util.Random(13)
    val attempts = (0 until 4).map { i =>
      val target = if (i % 2 == 0) lake else other
      val batch = Seq((s"n$i", Seq.fill(5)(rng.nextGaussian().toFloat), s"new $i"))
        .toDF("id", "vector", "document")
      scala.concurrent.Future(
        try { target.upsert(batch); "ok" }
        catch { case _: java.util.ConcurrentModificationException => "refused" })
    }
    val outcomes = scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(attempts),
      scala.concurrent.duration.Duration(120, "s"))
    pool.shutdown()
    assert(outcomes.forall(o => o == "ok" || o == "refused"),
      s"unexpected outcomes: $outcomes")
    // every winner's row landed; no refused op corrupted anything
    val landed = lake.read().where(col("id").startsWith("n")).count()
    assert(landed === outcomes.count(_ == "ok").toLong)
    assert(lake.read().select("id").distinct().count() === lake.count(),
      "ids must stay unique under contention")
    assert(!fsOf(lake).exists(lockPath(lake)), "no lock survives the race")
  }
}
