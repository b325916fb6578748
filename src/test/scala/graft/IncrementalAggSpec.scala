package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.IncrementalAgg

/** Incremental materialized aggregates over the change feed: per-key
  * sums/counts stay exactly equal to a from-scratch recompute while
  * each micro-batch touches only the CHANGED key buckets, replays are
  * no-ops (exactly-once via the pointer's batch id), and superseded
  * version dirs are vacuumable. */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def changeBatch(rows: Seq[(String, String, Long, String)]): DataFrame =
    rows.toDF("id", "document", "shard", "change")

  private val keys = Seq("shard")
  private val aggs = Seq(
    "doc_chars" -> length(col("document")).cast("double"))
  private def delta(rows: Seq[(String, String, Long, String)]) =
    IncrementalAgg.signedDelta(changeBatch(rows), keys, aggs)
  private def applyBatch(path: String, rows: Seq[(String, String, Long, String)],
      batchId: Long): Boolean =
    IncrementalAgg.applyDelta(spark, path, delta(rows), keys,
      aggs.map(_._1), batchId)
  private def stateMap(path: String): Map[Long, (Long, Double)] =
    IncrementalAgg.readState(spark, path).collect()
      .map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("__rows"), r.getAs[Double]("doc_chars"))).toMap

  test("signed deltas maintain exact per-key sums through insert/delete churn; emptied keys leave the state") {
    val path = Files.createTempDirectory("graft_incragg").toString + "/state"
    // batch 0: snapshot inserts across three shards
    assert(applyBatch(path, Seq(
      ("a", "aaaa", 1L, "insert"), ("b", "bb", 1L, "insert"),
      ("c", "cccccc", 2L, "insert"), ("d", "ddd", 3L, "insert")), 0L))
    assert(stateMap(path) === Map(
      1L -> ((2L, 6.0)), 2L -> ((1L, 6.0)), 3L -> ((1L, 3.0))))
    // batch 1: an upsert on shard 1 (delete+insert), a plain append on
    // shard 2, and the ONLY row of shard 3 deleted
    assert(applyBatch(path, Seq(
      ("b", "bb", 1L, "delete"), ("b", "bbbbb", 1L, "insert"),
      ("e", "e", 2L, "insert"), ("d", "ddd", 3L, "delete")), 1L))
    assert(stateMap(path) === Map(
      1L -> ((2L, 9.0)), 2L -> ((2L, 7.0))),
      "shard 3 was fully deleted and must leave the state")
    // the merged state equals a from-scratch recompute of the live rows
    val live = Seq(("a", "aaaa", 1L), ("b", "bbbbb", 1L),
      ("c", "cccccc", 2L), ("e", "e", 2L))
      .toDF("id", "document", "shard")
    val recomputed = live.groupBy("shard")
      .agg(count(lit(1)).as("__rows"),
        sum(length(col("document")).cast("double")).as("doc_chars"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(stateMap(path) === recomputed)
  }

  test("a replayed batch id is a NO-OP (exactly-once) and per-batch writes touch only affected buckets") {
    val path = Files.createTempDirectory("graft_incragg_replay").toString + "/state"
    assert(applyBatch(path, Seq(
      ("a", "aa", 1L, "insert"), ("b", "bbb", 2L, "insert"),
      ("c", "c", 3L, "insert"), ("d", "dddd", 4L, "insert")), 0L))
    val before = stateMap(path)
    // foreachBatch is at-least-once: the SAME batch id replayed must
    // refuse before any merge work
    assert(!applyBatch(path, Seq(("a", "aa", 1L, "insert")), 0L))
    assert(stateMap(path) === before, "a replayed batch must change nothing")
    // a later batch touching ONE shard rewrites only that shard's
    // bucket: the new version dir holds strictly fewer bucket
    // partitions than the full state
    assert(applyBatch(path, Seq(("e", "ee", 1L, "insert")), 1L))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def bucketDirs(v: String): Set[String] =
      fs.listStatus(new org.apache.hadoop.fs.Path(path, v))
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("__bucket="))
        .map(_.getPath.getName).toSet
    assert(bucketDirs("v1").size === 1,
      "a one-shard delta must rewrite exactly one bucket partition")
    assert(bucketDirs("v0").size === 4)
    assert(stateMap(path)(1L) === ((2L, 4.0)))
    // out-of-order/old batch ids are also refused
    assert(!applyBatch(path, Seq(("x", "x", 9L, "insert")), 1L))
  }

  test("vacuumState sweeps only provably-dead dirs: unreferenced by every retained pointer, aged if possibly in-flight") {
    val path = Files.createTempDirectory("graft_incragg_vac").toString + "/state"
    // 5 commits, each churning BOTH keys: pointer i maps both buckets
    // to version dir i; the pointer rotation retains the newest 4, so
    // after batch 4 only v0's pointer is gone and only v0 is
    // unreferenced by every retained pointer
    (0 to 4).foreach { i =>
      assert(applyBatch(path, Seq(
        (s"a$i", "aa", 1L, "insert"), (s"b$i", "bbb", 2L, "insert")), i.toLong))
    }
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // ANY fresh unreferenced dir may be an in-flight merge and must
    // survive — regardless of its number: after a torn pointer commit
    // the replaying merge writes dir v = (newest parseable + 1), which
    // can sit BELOW a corrupt pointer's number, so age (not number) is
    // the sole in-flight discriminator. v99 (above newest) and the
    // just-written v0 (below newest, unreferenced once its pointer
    // rotated out) both survive young, both sweep once aged.
    fs.mkdirs(new org.apache.hadoop.fs.Path(path, "v99"))
    val before = stateMap(path)
    assert(IncrementalAgg.vacuumState(spark, path) === 0L,
      "fresh dirs may be in-flight merges whatever their number — " +
        "nothing young is sweepable")
    assert(fs.exists(new org.apache.hadoop.fs.Path(path, "v0")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(path, "v99")))
    (1 to 4).foreach(i => assert(
      fs.exists(new org.apache.hadoop.fs.Path(path, s"v$i")),
      s"v$i is referenced by a retained pointer and must survive"))
    val aged = System.currentTimeMillis() - 3600000L
    fs.setTimes(new org.apache.hadoop.fs.Path(path, "v99"), aged, -1L)
    fs.setTimes(new org.apache.hadoop.fs.Path(path, "v0"), aged, -1L)
    assert(IncrementalAgg.vacuumState(spark, path) === 2L,
      "the aged v99 orphan and the aged unreferenced v0 are provably dead")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path, "v99")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path, "v0")))
    (1 to 4).foreach(i => assert(
      fs.exists(new org.apache.hadoop.fs.Path(path, s"v$i")),
      s"aged-but-referenced v$i must still survive"))
    assert(stateMap(path) === before, "vacuum must not change the state")
  }

  test("a corrupt or truncated newest pointer falls back to the previous commit; the next commit steps over it") {
    val path = Files.createTempDirectory("graft_incragg_crash").toString + "/state"
    assert(applyBatch(path, Seq(
      ("a", "aa", 1L, "insert"), ("b", "bbb", 2L, "insert")), 0L))
    val good = stateMap(path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a torn commit: the newest pointer file exists but is TRUNCATED
    // mid-owners (parses as plausible JSON prefix — the `complete`
    // sentinel is what rejects it); readers must resume from v0's
    // commit, not brick and not silently drop bucket 2's state
    val torn = new org.apache.hadoop.fs.Path(path, "_state.1.json")
    val out = fs.create(torn, false)
    out.write("""{"batch_id": 1, "owners": {"7": 0""".getBytes("UTF-8"))
    out.close()
    assert(stateMap(path) === good,
      "a truncated newest pointer must fall back to the last good commit")
    // the interrupted batch replays: batch id 1 is NOT committed (the
    // torn pointer doesn't count), so the replay applies and the commit
    // allocates PAST the torn file instead of colliding with it forever
    assert(applyBatch(path, Seq(("c", "cccc", 1L, "insert")), 1L))
    assert(stateMap(path)(1L) === ((2L, 6.0)))
    assert(stateMap(path)(2L) === good(2L), "bucket 2's state must survive")
    // an empty newest pointer (crash between create and write) likewise
    val empty = new org.apache.hadoop.fs.Path(path, "_state.9.json")
    fs.create(empty, false).close()
    assert(stateMap(path)(1L) === ((2L, 6.0)))
    assert(applyBatch(path, Seq(("d", "d", 2L, "insert")), 2L))
    assert(stateMap(path)(2L) === ((2L, 4.0)))
  }

  test("property: random delta sequences with replays and vacuums keep the state equal to a from-scratch recompute") {
    val rng = new scala.util.Random(20260814L)
    val path = Files.createTempDirectory("graft_incragg_fuzz").toString + "/state"
    // the live corpus as a multiset of (key, doc) — the feed contract:
    // deletes name rows that exist, byte-for-byte
    var rows = Vector.empty[(Long, String)]
    var nextDoc = 0
    var batchId = 0L
    var lastBatch: Option[(Seq[(String, String, Long, String)], Long)] = None
    (0 until 25).foreach { step =>
      rng.nextInt(10) match {
        case r if r < 5 =>
          // a mixed batch: fresh inserts + deletes of existing rows
          val ins = (0 until 1 + rng.nextInt(5)).map { _ =>
            val k = 1L + rng.nextInt(6)
            val doc = s"doc$nextDoc ${"x" * rng.nextInt(5)}"; nextDoc += 1
            (k, doc)
          }
          val nDel = if (rows.isEmpty) 0 else rng.nextInt(math.min(4, rows.size + 1))
          val delIdx = rng.shuffle(rows.indices.toList).take(nDel).toSet
          val dels = delIdx.toSeq.map(rows)
          val batch =
            ins.map { case (k, d) => ("i", d, k, "insert") } ++
              dels.map { case (k, d) => ("d", d, k, "delete") }
          assert(applyBatch(path, batch, batchId), s"step $step apply")
          rows = rows.zipWithIndex.collect {
            case (r, i) if !delIdx(i) => r } ++ ins
          lastBatch = Some((batch, batchId)); batchId += 1
        case 5 | 6 =>
          // at-least-once replay of the LAST batch: must refuse cleanly
          lastBatch.foreach { case (b, id) =>
            assert(!applyBatch(path, b, id), s"step $step replay must no-op") }
        case 7 =>
          // vacuum mid-sequence (staleMs 0: single-threaded, nothing is
          // genuinely in flight) — must never change the state
          IncrementalAgg.vacuumState(spark, path, staleMs = 0L); ()
        case _ =>
          // a delta-free trigger: commits the id, moves no data
          assert(applyBatch(path, Seq.empty, batchId), s"step $step empty")
          batchId += 1
      }
      val want = rows.groupBy(_._1).map { case (k, rs) =>
        k -> ((rs.size.toLong, rs.map(_._2.length).sum.toDouble)) }
      assert(stateMap(path) === want,
        s"step $step: state diverged from the recompute of the live corpus")
    }
  }

  test("min/max stay exact under delete churn: inserts tighten free, deleted extremes trigger the bounded per-key recompute") {
    val path = Files.createTempDirectory("graft_incragg_mm").toString + "/state"
    // the live corpus the recompute reads — maintained alongside the
    // batches exactly as a lake would be
    var live = Vector.empty[(String, String, Long)] // (id, document, shard)
    def corpusDf = live.toDF("id", "document", "shard")
    val extremes = Seq(
      IncrementalAgg.ExtremeSpec("min_len", length(col("document")).cast("double"), isMin = true),
      IncrementalAgg.ExtremeSpec("max_len", length(col("document")).cast("double"), isMin = false))
    def applyExt(rows: Seq[(String, String, Long, String)], id: Long): Boolean =
      IncrementalAgg.applyDelta(spark, path,
        IncrementalAgg.signedDelta(changeBatch(rows), keys, aggs, extremes = extremes),
        keys, aggs.map(_._1), id, extremes, Some(() => corpusDf))
    def stateMM(): Map[Long, (Long, Double, Double)] =
      IncrementalAgg.readState(spark, path).collect()
        .map(r => r.getAs[Long]("shard") ->
          ((r.getAs[Long]("__rows"), r.getAs[Double]("min_len"),
            r.getAs[Double]("max_len")))).toMap
    def recomputeMM(): Map[Long, (Long, Double, Double)] =
      live.groupBy(_._3).map { case (k, rs) =>
        k -> ((rs.size.toLong, rs.map(_._2.length).min.toDouble,
          rs.map(_._2.length).max.toDouble)) }
    def step(id: Long, ins: Seq[(String, String, Long)],
        del: Seq[(String, String, Long)]): Unit = {
      val batch = ins.map(r => (r._1, r._2, r._3, "insert")) ++
        del.map(r => (r._1, r._2, r._3, "delete"))
      live = live.filterNot(del.contains) ++ ins
      assert(applyExt(batch, id))
      assert(stateMM() === recomputeMM(), s"batch $id")
    }
    // seed two shards
    step(0L, Seq(("a", "aaaa", 1L), ("b", "bb", 1L), ("c", "cccccc", 2L)), Nil)
    // insert a new minimum: tightens with NO recompute path involved
    step(1L, Seq(("d", "x", 1L)), Nil)
    // delete a NON-extreme row: provisional extremes stand
    step(2L, Nil, Seq(("a", "aaaa", 1L)))
    // delete the MIN row: the stored min is stale → per-key recompute
    step(3L, Nil, Seq(("d", "x", 1L)))
    // delete the MAX row of shard 2 while inserting a smaller one
    step(4L, Seq(("e", "ee", 2L)), Seq(("c", "cccccc", 2L)))
    // upsert shape: delete+insert of one id in one batch
    step(5L, Seq(("b", "bbbbbbbbb", 1L)), Seq(("b", "bb", 1L)))
    // empty a shard entirely — it leaves the state
    step(6L, Nil, Seq(("e", "ee", 2L)))
    assert(!stateMM().contains(2L))
    // a replayed extreme batch is still a no-op
    assert(!applyExt(Seq(("z", "zz", 1L, "insert")), 6L))
    assert(stateMM() === recomputeMM())
  }

  test("property: random delta sequences keep min/max equal to a from-scratch recompute") {
    val rng = new scala.util.Random(20260815L)
    val path = Files.createTempDirectory("graft_incragg_mmfuzz").toString + "/state"
    var rows = Vector.empty[(Long, String)]
    def corpusDf = rows.map { case (k, d) => ("i", d, k) }
      .toDF("id", "document", "shard")
    val extremes = Seq(
      IncrementalAgg.ExtremeSpec("min_len", length(col("document")).cast("double"), isMin = true),
      IncrementalAgg.ExtremeSpec("max_len", length(col("document")).cast("double"), isMin = false))
    def applyExt(rows0: Seq[(String, String, Long, String)], id: Long): Boolean =
      IncrementalAgg.applyDelta(spark, path,
        IncrementalAgg.signedDelta(changeBatch(rows0), keys, aggs, extremes = extremes),
        keys, aggs.map(_._1), id, extremes, Some(() => corpusDf))
    var nextDoc = 0
    var batchId = 0L
    (0 until 15).foreach { step =>
      val ins = (0 until rng.nextInt(4)).map { _ =>
        val k = 1L + rng.nextInt(4)
        val doc = s"d$nextDoc${"x" * rng.nextInt(6)}"; nextDoc += 1
        (k, doc)
      }
      val nDel = if (rows.isEmpty) 0 else rng.nextInt(math.min(3, rows.size + 1))
      val delIdx = rng.shuffle(rows.indices.toList).take(nDel).toSet
      val dels = delIdx.toSeq.map(rows)
      val batch = ins.map { case (k, d) => ("i", d, k, "insert") } ++
        dels.map { case (k, d) => ("d", d, k, "delete") }
      rows = rows.zipWithIndex.collect { case (r, i) if !delIdx(i) => r } ++ ins
      assert(applyExt(batch, batchId), s"step $step"); batchId += 1
      val want = rows.groupBy(_._1).map { case (k, rs) =>
        k -> ((rs.size.toLong, rs.map(_._2.length).sum.toDouble,
          rs.map(_._2.length).min.toDouble, rs.map(_._2.length).max.toDouble)) }
      val got = IncrementalAgg.readState(spark, path).collect()
        .map(r => r.getAs[Long]("shard") ->
          ((r.getAs[Long]("__rows"), r.getAs[Double]("doc_chars"),
            r.getAs[Double]("min_len"), r.getAs[Double]("max_len")))).toMap
      assert(got === want, s"step $step: min/max state diverged")
    }
  }

  test("end-to-end: a graft-changes subscriber maintains per-shard stats equal to recomputing over the lake") {
    val dir = Files.createTempDirectory("graft_incragg_e2e")
    val cfg = LakeConfig(s"$dir/lake", dim = 3, numHashes = 2)
    val lake = Lake(spark, cfg)
    lake.ingest(Seq(
      ("a", Seq(1f, 0f, 0f), "alpha doc"), ("b", Seq(0f, 1f, 0f), "beta"),
      ("c", Seq(0.9f, 0.1f, 0f), "gamma gamma"), ("d", Seq(-1f, 0f, 0f), "delta"))
      .toDF("id", "vector", "document"))
    val feed = spark.readStream.format("graft-changes")
      .option("location", cfg.location)
      .option("dim", 3).option("numHashes", 2)
      .load()
    val statePath = s"$dir/state"
    val q = IncrementalAgg.maintain(feed, Seq("shard"),
      Seq("doc_chars" -> length(col("document")).cast("double")),
      statePath, s"$dir/ckpt")
    def recompute(): Map[Int, (Long, Double)] =
      lake.read().groupBy("shard")
        .agg(count(lit(1)).as("__rows"),
          sum(length(col("document")).cast("double")).as("doc_chars"))
        .collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def state(): Map[Int, (Long, Double)] =
      IncrementalAgg.readState(spark, statePath).collect()
        .map(r => r.getAs[Int]("shard") ->
          ((r.getAs[Long]("__rows"), r.getAs[Double]("doc_chars")))).toMap
    def retry[T](f: => T): T =
      Retry.onContention(maxAttempts = 100, maxDelayMs = 300)(f)
    try {
      q.processAllAvailable()
      assert(state() === recompute(), "snapshot batch must seed the state")
      retry(lake.deleteWhere(col("id") === "a"))
      retry(lake.upsert(Seq(("b", Seq(0f, 1f, 0.5f), "beta grew longer"))
        .toDF("id", "vector", "document")))
      retry(lake.ingest(Seq(("e", Seq(0f, 0f, 1f), "epsilon"))
        .toDF("id", "vector", "document")))
      q.processAllAvailable()
      assert(state() === recompute(),
        "after delete+upsert+append the maintained state must equal a full recompute")
    } finally q.stop()
  }

  test("end-to-end extremes: a subscriber maintains per-shard min/max doc length, exact through deletes") {
    val dir = Files.createTempDirectory("graft_incragg_e2emm")
    val cfg = LakeConfig(s"$dir/lake", dim = 3, numHashes = 2)
    val lake = Lake(spark, cfg)
    lake.ingest(Seq(
      ("a", Seq(1f, 0f, 0f), "alpha doc longer"), ("b", Seq(0f, 1f, 0f), "beta"),
      ("c", Seq(0.9f, 0.1f, 0f), "gamma gamma"), ("d", Seq(-1f, 0f, 0f), "x"))
      .toDF("id", "vector", "document"))
    val feed = spark.readStream.format("graft-changes")
      .option("location", cfg.location)
      .option("dim", 3).option("numHashes", 2)
      .load()
    val statePath = s"$dir/state"
    val q = IncrementalAgg.maintainWithExtremes(feed, Seq("shard"),
      Seq("doc_chars" -> length(col("document")).cast("double")),
      mins = Seq("min_len" -> length(col("document")).cast("double")),
      maxs = Seq("max_len" -> length(col("document")).cast("double")),
      corpus = () => lake.read(),
      statePath, s"$dir/ckpt")
    def recompute(): Map[Int, (Double, Double)] =
      lake.read().groupBy("shard")
        .agg(min(length(col("document")).cast("double")).as("mn"),
          max(length(col("document")).cast("double")).as("mx"))
        .collect().map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    def state(): Map[Int, (Double, Double)] =
      IncrementalAgg.readState(spark, statePath).collect()
        .map(r => r.getAs[Int]("shard") ->
          ((r.getAs[Double]("min_len"), r.getAs[Double]("max_len")))).toMap
    def retry[T](f: => T): T =
      Retry.onContention(maxAttempts = 100, maxDelayMs = 300)(f)
    try {
      q.processAllAvailable()
      assert(state() === recompute(), "snapshot seeds the extremes")
      // delete rows INCLUDING a shard's extreme; append a new extreme
      retry(lake.deleteWhere(col("id") === "d")) // "x" was a min somewhere
      retry(lake.ingest(Seq(("e", Seq(0f, 0f, 1f), "epsilon epsilon epsilon"))
        .toDF("id", "vector", "document")))
      q.processAllAvailable()
      assert(state() === recompute(),
        "after deleting an extreme row the maintained min/max must equal a full recompute")
    } finally q.stop()
  }
}
