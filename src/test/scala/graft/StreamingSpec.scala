package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventsStreaming
import graft.streaming.EventsStreaming.Event

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedAgg over a memory stream: tumbling day windows with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventsStreaming.windowedAgg(stream.toDF())
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 11:00:00"), 2, "click", 2.0),
        Event(3, ts("2024-01-02 09:00:00"), 1, "view", 5.0))
      q.processAllAvailable()
      // advance watermark far enough to close both day windows
      stream.addData(Event(9, ts("2024-01-10 00:00:00"), 9, "view", 0.0))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select("window_start", "event_type", "cnt", "sum_value")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(rows.contains(("2024-01-01 00:00:00.0", "click", 2L, 3.0)))
      assert(rows.contains(("2024-01-02 00:00:00.0", "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("stream-stream correlate: same-user events join within the gap, state stays bounded") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val views = MemoryStream[Event]
    val q = EventsStreaming.correlate(clicks.toDF(), views.toDF(), gapMinutes = 30)
      .writeStream.format("memory").queryName("corr_out")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 0.0),
        Event(2, ts("2024-01-01 10:00:00"), 2, "click", 0.0))
      views.addData(
        Event(10, ts("2024-01-01 10:10:00"), 1, "view", 0.0),  // within gap, user 1
        Event(11, ts("2024-01-01 11:10:00"), 1, "view", 0.0),  // past gap
        Event(12, ts("2024-01-01 10:20:00"), 3, "view", 0.0))  // other user
      q.processAllAvailable()
      // advance both watermarks so the join emits finalized results
      clicks.addData(Event(99, ts("2024-01-01 14:00:00"), 9, "click", 0.0))
      views.addData(Event(98, ts("2024-01-01 14:00:00"), 9, "view", 0.0))
      q.processAllAvailable()
      val rows = spark.table("corr_out")
        .select("left_id", "right_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows.contains((1L, 10L)))
      assert(!rows.contains((1L, 11L)) && !rows.contains((2L, 12L)))
    } finally q.stop()
  }

  test("stream-static interval join: RangeJoin tags streaming points against static windows") {
    // the same bin-bucketed equi-join that q_range_join plan-asserts,
    // composed with a stream: static intervals explode once, each
    // micro-batch equi-joins on its bin — no stateful theta join needed
    implicit val sqlCtx = spark.sqlContext
    val intervals = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-02 23:59:59")),
      (2L, ts("2024-01-05 00:00:00"), ts("2024-01-05 12:00:00"))
    ).toDF("iv_id", "lo", "hi")
    val stream = MemoryStream[Event]
    val joined = graft.operators.RangeJoin.pointInInterval(
      intervals, stream.toDF(), "lo", "hi", "ts", broadcastIntervals = false)
    val q = joined.select("event_id", "iv_id")
      .writeStream.format("memory").queryName("rj_out")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0), // in window 1
        Event(2, ts("2024-01-03 10:00:00"), 1, "click", 1.0), // in neither
        Event(3, ts("2024-01-05 06:00:00"), 2, "view", 2.0))  // in window 2
      q.processAllAvailable()
      val rows = spark.table("rj_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows === Set((1L, 1L), (3L, 2L)))
    } finally q.stop()
  }

  test("ingestStream: continuous writes land in the sharded lake and are queryable") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_lake")
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 5, numHashes = 4))
    val stream = MemoryStream[(Seq[Float], String)]
    val q = lake.ingestStream(
      stream.toDF().toDF("vector", "document"), s"$dir/ckpt")
    try {
      stream.addData((Seq(1.0f, 0f, 0f, 0f, 0f), "doc a"))
      q.processAllAvailable()
      stream.addData((Seq(0f, 1.0f, 0f, 0f, 0f), "doc b"))
      q.processAllAvailable()
      assert(lake.count() === 2L)
      val hit = lake.topKExact(Seq(1.0, 0, 0, 0, 0), 1).collect().head
      assert(hit.getAs[String]("document") === "doc a")
    } finally q.stop()
  }

  test("ingestStream over batch data: the start ROLLS a generation — batch rows stay visible at every stream phase") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_mix")
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 5, numHashes = 4))
    lake.ingest(Seq(("a1", Seq(1.0f, 0f, 0f, 0f, 0f), "batch doc"))
      .toDF("id", "vector", "document"))
    val stream = MemoryStream[(Seq[Float], String)]
    val q = lake.ingestStream(
      stream.toDF().toDF("vector", "document"), s"$dir/ckpt")
    try {
      // zero streamed batches: the sink's manifest is legitimately
      // empty — the lake must still read (and still show batch rows),
      // not throw schema-inference errors or hide the old generation
      assert(lake.count() === 1L, "batch rows visible pre-batch-0")
      stream.addData((Seq(0f, 1.0f, 0f, 0f, 0f), "stream doc"))
      q.processAllAvailable()
      assert(lake.count() === 2L, "batch + streamed rows both visible")
    } finally q.stop()
    val docs = lake.read().select("document").collect()
      .map(_.getString(0)).toSet
    assert(docs === Set("batch doc", "stream doc"))
    // the stream-owned generation refuses batch appends (its manifest
    // would never name them — they would be committed but invisible)
    val refused = intercept[IllegalArgumentException] {
      lake.ingest(Seq(("a2", Seq(0f, 0f, 1.0f, 0f, 0f), "late batch"))
        .toDF("id", "vector", "document"))
    }
    assert(refused.getMessage.contains("streaming sink"))
  }

  test("ingestStream: a failed start() leaves no pin — rows stay visible, maintenance stays allowed") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_failpin")
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 5, numHashes = 4))
    lake.ingest(Seq(("a1", Seq(1.0f, 0f, 0f, 0f, 0f), "doc a"))
      .toDF("id", "vector", "document"))
    // a BATCH frame has no writeStream: start() throws after the pin
    // was planted — the failure path must remove the empty manifest,
    // or every current-generation row vanishes from read() (the branch
    // honors an empty _spark_metadata) and maintenance is refused
    // forever on a lake no stream ever wrote to
    intercept[Exception] {
      lake.ingestStream(
        Seq((Seq(0f, 1.0f, 0f, 0f, 0f), "doc b")).toDF("vector", "document"),
        s"$dir/ckpt")
    }
    assert(lake.read().count() === 1L, "pre-existing rows still visible")
    assert(lake.compact() > 0L, "maintenance not refused")
    assert(lake.count() === 1L)
  }

  test("ingestStream: present-but-empty metadata map coerces to {id:1} like batch ingest") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_meta")
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 3, numHashes = 3))
    val stream = MemoryStream[(Seq[Float], String, Map[String, String])]
    val q = lake.ingestStream(
      stream.toDF().toDF("vector", "document", "metadata"), s"$dir/ckpt")
    try {
      stream.addData((Seq(1.0f, 0f, 0f), "empty meta", Map.empty[String, String]))
      stream.addData((Seq(0f, 1.0f, 0f), "has meta", Map("k" -> "v")))
      q.processAllAvailable()
      val got = lake.read().select("document", "metadata").collect()
        .map(r => r.getString(0) -> r.getAs[Map[String, String]]("metadata")).toMap
      // the reference's ingest quirk (index.py:572-575) — identical on
      // the batch and streaming paths because both run withDerived
      assert(got("empty meta") === Map("id" -> "1"))
      assert(got("has meta") === Map("k" -> "v"))
      // streaming start also stamps the sidecar
      assert(lake.lastUpdate().isDefined)
    } finally q.stop()
  }

  test("sessionWindowAgg: native session windows merge within the gap, split past it") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventsStreaming.sessionWindowAgg(stream.toDF(), gap = "30 minutes")
      .writeStream.format("memory").queryName("sess_win_out")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:10:00"), 1, "click", 1.0), // same session
        Event(3, ts("2024-01-01 12:00:00"), 1, "view", 1.0))  // past the gap
      q.processAllAvailable()
      // advance the watermark so both sessions finalize
      stream.addData(Event(9, ts("2024-01-02 00:00:00"), 9, "view", 0.0))
      q.processAllAvailable()
      val sess = spark.table("sess_win_out")
        .where(org.apache.spark.sql.functions.col("user_id") === 1)
        .select("session_start", "n_events")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSet
      assert(sess === Set(("2024-01-01 10:00:00.0", 2L), ("2024-01-01 12:00:00.0", 1L)))
    } finally q.stop()
  }

  test("enrich: stream-static broadcast join attaches dimension rows per batch") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = EventsStreaming.enrich(stream.toDF(), dim, "user_id")
      .select("event_id", "user_id", "tier")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:01:00"), 2, "view", 1.0),
        Event(3, ts("2024-01-01 10:02:00"), 7, "view", 1.0)) // no dim row
      q.processAllAvailable()
      val rows = spark.table("enrich_out").collect()
        .map(r => (r.getLong(0), Option(r.getString(2)))).toMap
      assert(rows === Map(1L -> Some("gold"), 2L -> Some("basic"), 3L -> None))
    } finally q.stop()
  }

  test("exactDedupGate: a replayed fingerprint within the watermark is dropped") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, Timestamp)]
    val q = graft.streaming.DedupStreaming
      .exactDedupGate(stream.toDF().toDF("doc_id", "text", "ts"), horizon = "1 hour")
      .writeStream.format("memory").queryName("exact_dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData((1L, "same text", ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // a LATER batch replays the same content inside the horizon — the
      // cross-batch case an in-batch dropDuplicates cannot catch
      stream.addData(
        (2L, "same text", ts("2024-01-01 10:05:00")),
        (3L, "other text", ts("2024-01-01 10:06:00")))
      q.processAllAvailable()
      val ids = spark.table("exact_dedup_out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids === Set(1L, 3L), "doc 2 replays doc 1's fingerprint")
    } finally q.stop()
  }

  test("admitAgainstCorpus: stream-static gate rejects exact and near dups of the corpus") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // corpus: two documents; "alpha beta gamma" also occupies a SimHash
    // bucket that a token-permuted variant will collide with (SimHash
    // over a distinct-token SET is order-insensitive)
    val corpus = Seq("alpha beta gamma", "delta epsilon zeta").toDF("text")
    val stream = MemoryStream[(Long, String)]
    val q = graft.streaming.DedupStreaming
      .admitAgainstCorpus(stream.toDF().toDF("doc_id", "text"), corpus)
      .writeStream.format("memory").queryName("admit_out")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(
        (1L, "alpha beta gamma"), // exact dup → rejected
        (2L, "gamma beta alpha"), // same token set → same bucket → rejected
        (3L, "totally fresh content here")) // admitted
      q.processAllAvailable()
      // a later batch re-probes the same static corpus
      stream.addData((4L, "delta epsilon zeta"), (5L, "another new one"))
      q.processAllAvailable()
      val ids = spark.table("admit_out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids === Set(3L, 5L),
        "only documents novel to the corpus pass the gate")
    } finally q.stop()
  }

  test("corpusGate: one corpus scan per refresh (not per batch), decisions unchanged") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // accumulator counts every row the corpus plan actually produces
    val acc = spark.sparkContext.longAccumulator("corpus_rows_read")
    val corpusTexts = Seq("alpha beta gamma", "delta epsilon zeta")
    val corpus = corpusTexts.toDS().map { t => acc.add(1); t }.toDF("text")
    val gate = graft.streaming.DedupStreaming.corpusGate(corpus,
      estItems = 100L, numBits = 8192L)
    assert(acc.value === 2L, "constructing the gate snapshots the corpus once")

    val admitted = scala.collection.mutable.Set.empty[Long]
    val stream = MemoryStream[(Long, String)]
    val q = stream.toDF().toDF("doc_id", "text")
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        admitted.synchronized {
          admitted ++= gate.admitBatch(batch).select("doc_id")
            .collect().map(_.getLong(0))
        }
        ()
      }.start()
    try {
      // same scenario as the admitAgainstCorpus test: decisions must match
      stream.addData(
        (1L, "alpha beta gamma"), // exact dup → rejected
        (2L, "gamma beta alpha"), // same token set → same bucket → rejected
        (3L, "totally fresh content here")) // admitted (sketch-definite novel)
      q.processAllAvailable()
      stream.addData((4L, "delta epsilon zeta"), (5L, "another new one"))
      q.processAllAvailable()
      assert(admitted.toSet === Set(3L, 5L),
        "sketch routing must not change admission decisions")
      assert(acc.value === 2L,
        s"batches must probe the snapshot, never re-scan the corpus (read ${acc.value})")
      // an explicit refresh is the ONLY thing that re-reads the corpus
      gate.refresh()
      assert(acc.value === 4L)
    } finally q.stop()
  }

  test("topKStream: a stream of query vectors is served against the lake, state bounded at k") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_topk_stream")
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 3, numHashes = 2))
    lake.ingest(Seq(
      ("a", Seq(1f, 0f, 0f), "east"),
      ("b", Seq(0f, 1f, 0f), "north"),
      ("c", Seq(0.9f, 0.1f, 0f), "east-ish"))
      .toDF("id", "vector", "document"))
    val stream = MemoryStream[(Long, Seq[Double])]
    val q = lake.topKStream(stream.toDF().toDF("qid", "qvec"), k = 2)
      .writeStream.format("memory").queryName("serve_out")
      .outputMode(OutputMode.Update()).start()
    try {
      stream.addData((1L, Seq(1.0, 0.0, 0.0)), (2L, Seq(0.0, 1.0, 0.0)))
      q.processAllAvailable()
      val got = spark.table("serve_out")
        .select(col("qid"), col("top.id").as("ids")).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
      assert(got(1L) === Seq("a", "c"), "query 1 nearest: exact then close")
      // (0,1,0): b exact (dist 0), then c (cos 0.1/0.906 → dist 0.89 < a's 1.0)
      assert(got(2L) === Seq("b", "c"), s"query 2 got ${got(2L)}")
      assert(got.values.forall(_.length <= 2), "state bounded at k")
      // a later micro-batch serves new queries against the same lake
      stream.addData((3L, Seq(0.95, 0.05, 0.0)))
      q.processAllAvailable()
      val q3 = spark.table("serve_out").where(col("qid") === 3L)
        .select(col("top.id")).head().getSeq[String](0).toSeq
      assert(q3 === Seq("a", "c"))
    } finally q.stop()
  }

  test("topKStreamRouted: each query is served from its routed shard only, matching single-probe topK") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_topk_stream_r")
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 3, numHashes = 2))
    lake.ingest(Seq(
      ("a", Seq(1f, 0f, 0f), "east"),
      ("b", Seq(0f, 1f, 0f), "north"),
      ("c", Seq(0.9f, 0.1f, 0f), "east-ish"),
      ("d", Seq(-1f, 0f, 0f), "west"))
      .toDF("id", "vector", "document"))
    val queries = Seq((1L, Seq(1.0, 0.0, 0.0)), (2L, Seq(0.0, 1.0, 0.0)),
      (3L, Seq(-0.9, -0.1, 0.0)))
    val stream = MemoryStream[(Long, Seq[Double])]
    val q = lake.topKStreamRouted(stream.toDF().toDF("qid", "qvec"), k = 2)
      .writeStream.format("memory").queryName("serve_routed_out")
      .outputMode(OutputMode.Update()).start()
    try {
      stream.addData(queries: _*)
      q.processAllAvailable()
      val got = spark.table("serve_routed_out")
        .select(col("qid"), col("top.id").as("ids")).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
      // the streamed answer IS the single-probe topK answer, per query
      // (including empty for a query routed to an unoccupied shard)
      queries.foreach { case (qid, qv) =>
        val single = lake.topK(qv, 2).select("id").collect()
          .map(_.getString(0)).toSeq
        assert(got.getOrElse(qid, Nil) === single,
          s"qid $qid: routed stream answer must equal single-probe topK")
      }
      // sanity that routing actually separates: queries 1 and 3 route to
      // different shards and must not see each other's neighbors
      assert(lake.lsh.shardOf(queries(0)._2) !== lake.lsh.shardOf(queries(2)._2))
    } finally q.stop()
  }

  test("graft-changes source: snapshot then append/delete/upsert stream through as exact netted deltas") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_chsource")
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 3, numHashes = 2))
    lake.ingest(Seq(
      ("a", Seq(1f, 0f, 0f), "da"), ("b", Seq(0f, 1f, 0f), "db"),
      ("c", Seq(0.9f, 0.1f, 0f), "dc"), ("d", Seq(-1f, 0f, 0f), "dd"))
      .toDF("id", "vector", "document"))
    val feed = spark.readStream.format("graft-changes")
      .option("location", lake.cfg.location)
      .option("dim", 3).option("numHashes", 2)
      .load()
    assert(feed.columns.toSeq ===
      Seq("id", "vector", "metadata", "document", "timestamp", "shard", "change"))
    val q = feed.select("id", "document", "change")
      .writeStream.format("memory").queryName("chfeed_out")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      // batch 0 = the full sealed snapshot as inserts (Delta-style)
      val snap = spark.table("chfeed_out").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      assert(snap.length === 4 && snap.forall(_._3 === "insert"))
      assert(snap.map(_._1).sorted.toSeq === Seq("a", "b", "c", "d"))
      // an idle trigger seals nothing: no sidecar accumulation
      val sealsBefore = lake.history().where(col("sealed")).count()
      q.processAllAvailable()
      assert(lake.history().where(col("sealed")).count() === sealsBefore,
        "an idle stream must not take new seal sync points")
      // one interval carrying a delete + an upsert + an append nets to
      // the exact row-level delta: old rows out, new rows in, untouched
      // rows (even when their shard was rewritten) absent. The feed's
      // seal is a millisecond sidecar commit that can momentarily hold
      // the writer lock — a colliding writer retries, the documented
      // posture for ANY lock collision
      def retry[T](f: => T): T =
        Retry.onContention(maxAttempts = 100, maxDelayMs = 300)(f)
      retry(lake.deleteWhere(col("id") === "a"))
      retry(lake.upsert(Seq(("b", Seq(0f, 1f, 0.5f), "db-v2"))
        .toDF("id", "vector", "document")))
      retry(lake.ingest(Seq(("e", Seq(0f, 0f, 1f), "de"))
        .toDF("id", "vector", "document")))
      q.processAllAvailable()
      val delta = spark.table("chfeed_out").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)))
        .filterNot(snap.contains)
      assert(delta.toSet === Set(
        ("a", "da", "delete"), ("b", "db", "delete"),
        ("b", "db-v2", "insert"), ("e", "de", "insert")),
        s"netted delta mismatch: ${delta.mkString(", ")}")
    } finally q.stop()
  }

  test("graft-changes restart: an idle lake's sync point is ADOPTED, not re-sealed; a mid-air stamp is never mistaken for our seal") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_chrestart")
    val cfg = LakeConfig(s"$dir/lake", dim = 3, numHashes = 2)
    val lake = Lake(spark, cfg)
    lake.ingest(Seq(("a", Seq(1f, 0f, 0f), "da"), ("b", Seq(0f, 1f, 0f), "db"))
      .toDF("id", "vector", "document"))
    val params = Map("location" -> cfg.location, "dim" -> "3", "numHashes" -> "2")
    // first subscriber seals the initial sync point
    val s1 = new graft.streaming.LakeChangeSource(spark, cfg, params)
    val o1 = s1.getOffset
    assert(o1.isDefined)
    assert(lake.history().where(col("sealed")).count() === 1L)
    // RESTART (fresh source instance = crash-looped subscriber): the
    // lake is idle, so the new instance must adopt the existing sync
    // point — sealing a fresh one per restart grows the permanently-
    // retained sidecar set without bound
    val s2 = new graft.streaming.LakeChangeSource(spark, cfg, params)
    val o2 = s2.getOffset
    assert(o2.map(_.json) === o1.map(_.json),
      "restart on an idle lake must resume the existing sync point")
    assert(lake.history().where(col("sealed")).count() === 1L,
      "restart on an idle lake must not seal a new sync point")
    // data moves: the SAME instance seals a new point and serves the delta
    lake.ingest(Seq(("c", Seq(0f, 0f, 1f), "dc")).toDF("id", "vector", "document"))
    val o3 = s2.getOffset
    assert(o3.isDefined)
    assert(o3.map(_.json) !== o2.map(_.json))
    // getBatch(o2,o3) IS changesBetween(v2,v3) wrapped streaming (can't
    // collect a streaming frame here) — assert the same delta unwrapped
    val delta = lake.changesBetween(
        o2.get.json.trim.toLong, o3.get.json.trim.toLong)
      .select("id", "change").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(delta.toSet === Set(("c", "insert")))
    // the pinned stamp is the one sidecar o3 RECORDED (not a re-read): a
    // foreign stamp landing right after the seal must still be seen as
    // NEW data — simulate it, then confirm the next tick seals again
    lake.ingest(Seq(("d", Seq(1f, 1f, 0f), "dd")).toDF("id", "vector", "document"))
    val o4 = s2.getOffset
    assert(o4.map(_.json) !== o3.map(_.json),
      "a stamp moved by a foreign writer must trigger a new sync point")
  }

  test("graft-changes netted=false runs the DSv2 MicroBatchStream: raw file-level deltas whose NET equals the lake") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_chv2")
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 3, numHashes = 2))
    lake.ingest(Seq(
      ("a", Seq(1f, 0f, 0f), "da"), ("b", Seq(0f, 1f, 0f), "db"),
      ("c", Seq(0.9f, 0.1f, 0f), "dc"), ("d", Seq(-1f, 0f, 0f), "dd"))
      .toDF("id", "vector", "document"))
    val feed = spark.readStream.format("graft-changes")
      .option("location", lake.cfg.location)
      .option("dim", 3).option("numHashes", 2)
      .option("netted", false)
      .load()
    assert(feed.columns.toSeq ===
      Seq("id", "vector", "metadata", "document", "timestamp", "shard", "change"))
    val q = feed.select("id", "document", "shard", "change")
      .writeStream.format("memory").queryName("chv2_out")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      // the DSv2 path must actually be the one running (not the v1
      // fallback): the progress source description names the v2 stream
      val desc = q.lastProgress.sources.head.description
      assert(desc.contains("LakeChangesMicroBatchStream"),
        s"expected the DSv2 stream, got source: $desc")
      // batch 0 = the full sealed snapshot as inserts
      val snap = spark.table("chv2_out").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(3)))
      assert(snap.length === 4 && snap.forall(_._3 === "insert"))
      // churn: delete + upsert + append in one interval. RAW mode shows
      // rewrite churn (untouched rows of rewritten shards appear as
      // delete+insert pairs) — the invariant is the NET: applying
      // +insert/−delete over the whole feed reproduces the lake exactly,
      // the delta-applier contract the raw feed exists for
      def retry[T](f: => T): T =
        Retry.onContention(maxAttempts = 100, maxDelayMs = 300)(f)
      retry(lake.deleteWhere(col("id") === "a"))
      retry(lake.upsert(Seq(("b", Seq(0f, 1f, 0.5f), "db-v2"))
        .toDF("id", "vector", "document")))
      retry(lake.ingest(Seq(("e", Seq(0f, 0f, 1f), "de"))
        .toDF("id", "vector", "document")))
      q.processAllAvailable()
      val net = spark.table("chv2_out").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(3)))
        .groupBy(t => (t._1, t._2))
        .map { case (k, rows) =>
          k -> rows.map(t => if (t._3 == "insert") 1 else -1).sum }
        .filter(_._2 != 0)
      assert(net.values.forall(_ == 1), s"net must be 0 or +1 per row: $net")
      assert(net.keySet === lake.read().select("id", "document").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet,
        "applying the raw feed must reproduce the lake exactly")
      // the rewrite was VISIBLE raw: more rows than the netted minimum
      // (4 = a-delete, b-delete, b-v2-insert, e-insert) flowed after
      // the snapshot iff any rewritten shard held untouched rows; at
      // minimum the raw count can never be BELOW the netted delta
      assert(spark.table("chv2_out").count() >= snap.length + 4L)
    } finally q.stop()
  }

  test("graft-changes DSv2 restart resumes from the checkpointed seal: no snapshot replay, only the new delta") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_chv2r")
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 3, numHashes = 2))
    lake.ingest(Seq(("a", Seq(1f, 0f, 0f), "da"), ("b", Seq(0f, 1f, 0f), "db"))
      .toDF("id", "vector", "document"))
    // a FILE sink (memory sink cannot recover from a checkpoint): the
    // cumulative output across restarts proves exactly-once handoff
    def start() = spark.readStream.format("graft-changes")
      .option("location", lake.cfg.location)
      .option("dim", 3).option("numHashes", 2)
      .option("netted", false)
      .load()
      .select("id", "change")
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    def outRows() = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(outRows().sorted === Seq(("a", "insert"), ("b", "insert")),
      "snapshot = 2 inserts")
    def retry[T](f: => T): T =
      Retry.onContention(maxAttempts = 100, maxDelayMs = 300)(f)
    retry(lake.ingest(Seq(("c", Seq(0f, 0f, 1f), "dc"))
      .toDF("id", "vector", "document")))
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(outRows().sorted ===
        Seq(("a", "insert"), ("b", "insert"), ("c", "insert")),
        "restart must serve ONLY the new delta — no snapshot replay, " +
          s"no duplicates; got: ${outRows().mkString(", ")}")
    } finally q2.stop()
  }

  test("graft-changes refuses at subscribe time when the current generation is a streaming sink") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_chrefuse")
    val cfg = LakeConfig(s"$dir/lake", dim = 3, numHashes = 2)
    val lake = Lake(spark, cfg)
    lake.ingest(Seq(("a", Seq(1f, 0f, 0f), "da")).toDF("id", "vector", "document"))
    // make the current generation stream-owned the way ingestStream's
    // sink would: a _spark_metadata manifest dir inside its tree
    val fs = new org.apache.hadoop.fs.Path(cfg.location)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val genDir = fs.listStatus(new org.apache.hadoop.fs.Path(cfg.location))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen-"))
      .map(_.getPath).maxBy(_.getName)
    fs.mkdirs(new org.apache.hadoop.fs.Path(genDir, "_spark_metadata"))
    val params = Map("location" -> cfg.location, "dim" -> "3", "numHashes" -> "2")
    val e = intercept[IllegalArgumentException](
      new graft.streaming.LakeChangeSource(spark, cfg, params))
    assert(e.getMessage.contains("streaming-sink"),
      s"subscribe must fail with the real reason, got: ${e.getMessage}")
  }

  test("topKStreamRouted nprobe: full ladder matches per-query topKMultiProbe") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_topk_stream_mp")
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 3, numHashes = 2))
    lake.ingest(Seq(
      ("a", Seq(1f, 0f, 0f), "east"),
      ("b", Seq(0f, 1f, 0f), "north"),
      ("c", Seq(0.9f, 0.1f, 0f), "east-ish"),
      ("d", Seq(-1f, 0f, 0f), "west"))
      .toDF("id", "vector", "document"))
    val queries = Seq((1L, Seq(1.0, 0.0, 0.0)), (2L, Seq(0.0, 1.0, 0.0)),
      (3L, Seq(-0.9, -0.1, 0.0)))
    val stream = MemoryStream[(Long, Seq[Double])]
    val q = lake.topKStreamRouted(stream.toDF().toDF("qid", "qvec"), k = 3,
        nprobe = 1 + 2)
      .writeStream.format("memory").queryName("serve_routed_mp_out")
      .outputMode(OutputMode.Update()).start()
    try {
      stream.addData(queries: _*)
      q.processAllAvailable()
      val got = spark.table("serve_routed_mp_out")
        .select(col("qid"), col("top.id").as("ids")).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
      // the full probe ladder in the stream = per-query topKMultiProbe
      queries.foreach { case (qid, qv) =>
        val multi = lake.topKMultiProbe(qv, 3).select("id").collect()
          .map(_.getString(0)).toSeq
        assert(got.getOrElse(qid, Nil) === multi,
          s"qid $qid: full-ladder stream answer must equal topKMultiProbe")
      }
      // and it is a strict widening over the single-probe stream answer
      // for at least one query here (the dial actually does something)
      val single = queries.map { case (qid, qv) =>
        qid -> lake.topK(qv, 3).count()
      }.toMap
      assert(queries.exists { case (qid, _) =>
        got.getOrElse(qid, Nil).size > single(qid) },
        "expected the Hamming≤1 ladder to widen at least one answer")
      assert(intercept[IllegalArgumentException](
        lake.topKStreamRouted(stream.toDF().toDF("qid", "qvec"), k = 3,
          nprobe = 9)).getMessage.contains("nprobe"))
    } finally q.stop()
  }

  test("topKStreamExpiring: idle query state is retired by the event-time ttl") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_topk_ttl")
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 3, numHashes = 2))
    lake.ingest(Seq(
      ("a", Seq(1f, 0f, 0f), "east"),
      ("b", Seq(0f, 1f, 0f), "north"))
      .toDF("id", "vector", "document"))
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def at(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val stream = MemoryStream[(Long, Seq[Double], java.sql.Timestamp)]
    val q = lake.topKStreamExpiring(
      stream.toDF().toDF("qid", "qvec", "qtime"), k = 1,
      ttl = java.time.Duration.ofMinutes(30))
      .writeStream.format("memory").queryName("serve_ttl_out")
      .outputMode(OutputMode.Update()).start()
    def stateRows: Long = {
      val p = q.lastProgress
      if (p == null || p.stateOperators.isEmpty) -1L
      else p.stateOperators.map(_.numRowsTotal).sum
    }
    try {
      stream.addData((1L, Seq(1.0, 0.0, 0.0), t0), (2L, Seq(0.0, 1.0, 0.0), t0))
      q.processAllAvailable()
      val got = spark.table("serve_ttl_out")
        .select(col("qid"), col("top.id").as("ids")).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
      assert(got(1L) === Seq("a") && got(2L) === Seq("b"))
      assert(stateRows === 2L, "two live query ids, one state row each")
      // +120 min: the watermark jumps past qids 1/2's 30-min ttl. The
      // first batch advances the watermark, the next applies timeouts.
      stream.addData((3L, Seq(1.0, 0.0, 0.0), at(120)))
      q.processAllAvailable()
      stream.addData((4L, Seq(0.0, 1.0, 0.0), at(121)))
      q.processAllAvailable()
      assert(stateRows === 2L,
        s"qids 1/2 expired, 3/4 live — state tracks the LIVE set, got $stateRows")
      // the expired ids produced no ghost output rows on expiry
      assert(spark.table("serve_ttl_out").where(col("qid") === 3L).count() >= 1L)
    } finally q.stop()
  }

  test("corpusGate.refreshIfChanged: re-snapshots exactly when the lake's stamp moves") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_gate_lake")
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 3, numHashes = 2))
    lake.ingest(Seq((Seq(1f, 0f, 0f), "alpha beta gamma"))
      .toDF("vector", "document"))
    val acc = spark.sparkContext.longAccumulator("corpus_rows")
    // the corpus view reads the LAKE; accumulator counts rows it produces
    def corpusView = lake.read()
      .select(org.apache.spark.sql.functions.col("document").as("text"))
      .map { r => acc.add(1); r }(org.apache.spark.sql.Encoders.row(
        new org.apache.spark.sql.types.StructType()
          .add("text", org.apache.spark.sql.types.StringType)))
      .toDF()
    val gate = graft.streaming.DedupStreaming.corpusGate(corpusView,
      estItems = 100L, numBits = 8192L)
    val afterBuild = acc.value
    assert(gate.refreshIfChanged(lake.lastUpdate()),
      "first token call always refreshes")
    assert(!gate.refreshIfChanged(lake.lastUpdate()),
      "unchanged stamp must not refresh")
    val quiet = acc.value
    assert(!gate.refreshIfChanged(lake.lastUpdate()))
    assert(acc.value === quiet, "no-op refresh checks must not scan the corpus")
    // the lake grows -> last_update moves -> the gate re-snapshots and
    // the newly ingested document is now rejected
    val stampBefore = lake.lastUpdate()
    lake.ingest(Seq((Seq(0f, 1f, 0f), "delta epsilon zeta"))
      .toDF("vector", "document"))
    assert(lake.lastUpdate() !== stampBefore, "ingest must move the stamp")
    assert(gate.refreshIfChanged(lake.lastUpdate()))
    assert(acc.value > quiet, "a real refresh re-scans the grown corpus")
    val decisions = gate.admitBatch(Seq(
      (1L, "delta epsilon zeta"), (2L, "brand new text"))
      .toDF("doc_id", "text"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(decisions === Set(2L), "post-refresh snapshot sees the new corpus doc")
    assert(afterBuild >= 1L)
  }

  test("corpusGate on a batch frame is row-identical to admitAgainstCorpus") {
    import spark.implicits._
    val corpus = Seq("alpha beta gamma", "delta epsilon zeta").toDF("text")
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "gamma beta alpha"),
      (3L, "totally fresh content here"), (4L, "delta epsilon zeta"),
      (5L, "another new one")).toDF("doc_id", "text")
    val viaGate = graft.streaming.DedupStreaming
      .corpusGate(corpus, estItems = 100L, numBits = 8192L).admitBatch(docs)
    val exact = graft.streaming.DedupStreaming.admitAgainstCorpus(docs, corpus)
    assert(viaGate.columns.toSeq === exact.columns.toSeq)
    assert(viaGate.exceptAll(exact).isEmpty && exact.exceptAll(viaGate).isEmpty)
  }

  test("continuous curation pipeline: exact gate -> corpus admission -> lake ingest, one stream") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    // the full continuous form of the batch pipeline: replay dedup
    // (exactDedupGate), then corpus near-dup admission
    // (admitAgainstCorpus), then embed + ingest into the sharded lake —
    // all one streaming plan feeding Lake.ingestStream
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_e2e")
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 4, numHashes = 3))
    val corpus = Seq("alpha beta gamma").toDF("text")
    val stream = MemoryStream[(Long, String, Timestamp)]
    val gated = graft.streaming.DedupStreaming.exactDedupGate(
      stream.toDF().toDF("doc_id", "text", "ts"), horizon = "1 hour")
    val admitted = graft.streaming.DedupStreaming.admitAgainstCorpus(gated, corpus)
    // deterministic fake embedding: 4 dims from the portable text hash
    val embedded = admitted.select(
      transform(sequence(lit(0), lit(3)),
        i => (pmod(graft.functions.TextFunctions.h60(col("text")) + i, lit(1000L))
          .cast("double") / 1000.0).cast("float")).as("vector"),
      col("text").as("document"))
    val q = lake.ingestStream(embedded, s"$dir/ckpt")
    try {
      stream.addData(
        (1L, "fresh doc one", ts("2024-01-01 10:00:00")),
        (2L, "fresh doc one", ts("2024-01-01 10:01:00")), // replay → exact gate drops
        (3L, "alpha beta gamma", ts("2024-01-01 10:02:00")), // corpus dup → admission drops
        (4L, "fresh doc two", ts("2024-01-01 10:03:00")))
      q.processAllAvailable()
      stream.addData(
        (5L, "fresh doc one", ts("2024-01-01 10:10:00")), // replay across batches → dropped
        (6L, "fresh doc three", ts("2024-01-01 10:11:00")))
      q.processAllAvailable()
      val docs = lake.read().select("document").collect().map(_.getString(0)).toSet
      assert(docs === Set("fresh doc one", "fresh doc two", "fresh doc three"),
        s"pipeline admitted: $docs")
      assert(lake.count() === 3L)
    } finally q.stop()
  }

  test("ingestStream: sidecar last_update re-stamps after a data micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_stamp")
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 3, numHashes = 3))
    val stream = MemoryStream[(Seq[Float], String)]
    val q = lake.ingestStream(stream.toDF().toDF("vector", "document"), s"$dir/ckpt")
    def sidecar(): String = lake.lastUpdate().getOrElse("")
    try {
      val atStart = sidecar()
      Thread.sleep(5) // ensure a later batch stamp can't collide on clock precision
      stream.addData((Seq(1.0f, 0f, 0f), "doc"))
      q.processAllAvailable()
      // the listener fires asynchronously after the batch commits
      val deadline = System.nanoTime() + 15_000_000_000L
      var refreshed = sidecar() != atStart
      while (!refreshed && System.nanoTime() < deadline) {
        Thread.sleep(50); refreshed = sidecar() != atStart
      }
      assert(refreshed,
        "sidecar last_update should refresh after a data-carrying micro-batch")
    } finally q.stop()
  }

  test("ingestStream checkpoint recovery: restart resumes exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_rec")
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 3, numHashes = 3))

    val s1 = MemoryStream[(Seq[Float], String)]
    val q1 = lake.ingestStream(s1.toDF().toDF("vector", "document"), s"$dir/ckpt")
    s1.addData((Seq(1.0f, 0f, 0f), "a"))
    q1.processAllAvailable()
    q1.stop()
    assert(lake.count() === 1L)

    // restart from the SAME source + checkpoint: the committed batch must
    // not replay (offset 1 is recorded), only post-restart data lands
    s1.addData((Seq(0f, 1.0f, 0f), "b"))
    val q2 = lake.ingestStream(s1.toDF().toDF("vector", "document"), s"$dir/ckpt")
    try {
      q2.processAllAvailable()
      assert(lake.count() === 2L)
      val docs = lake.read().select("document").collect().map(_.getString(0)).sorted
      assert(docs.toSeq === Seq("a", "b"))
    } finally q2.stop()
  }

  test("streaming dedup: dropDuplicatesWithinWatermark suppresses replayed events") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = stream.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0), // same-batch dup
        Event(2, ts("2024-01-01 10:05:00"), 1, "view", 2.0))
      q.processAllAvailable()
      stream.addData(Event(1, ts("2024-01-01 10:10:00"), 1, "click", 1.0)) // replay
      q.processAllAvailable()
      assert(spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    } finally q.stop()
  }

  test("nearDupGate: first doc claims its SimHash bucket, later dups rejected across batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = graft.streaming.DedupStreaming
      .nearDupGate(stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("dedup_gate_out")
      .outputMode(OutputMode.Update()).start()
    try {
      val textA = "the quick brown fox jumps over the lazy dog again and again"
      val textB = "completely different content about spark shuffles and joins"
      stream.addData((1L, textA), (2L, textB))
      q.processAllAvailable()
      // batch 2: doc 3 repeats textA -> same bucket -> rejected (state
      // remembers doc 1's claim); doc 4 is novel -> admitted
      stream.addData((3L, textA), (4L, "a third topic entirely about parquet footers"))
      q.processAllAvailable()
      val got = spark.table("dedup_gate_out")
        .select("doc_id", "admitted").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(got(1L) === true)
      assert(got(2L) === true)
      assert(got(3L) === false)
      assert(got(4L) === true)
    } finally q.stop()
  }

  test("sessionize: stateful per-user session counting across batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventsStreaming.sessionize(stream.toDS(), gapSeconds = 1800L)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Update()).start()
    try {
      // batch 1: user 1 has two events 10 min apart (1 session)
      stream.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:10:00"), 1, "click", 1.0))
      q.processAllAvailable()
      // batch 2: user 1 returns 2 hours later -> second session (state kept)
      stream.addData(Event(3, ts("2024-01-01 12:30:00"), 1, "view", 1.0))
      q.processAllAvailable()
      val last = spark.table("sess_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // latest update for user 1: 2 sessions, 3 events
      assert(last.contains((1L, 2L, 3L)))
    } finally q.stop()
  }
}
