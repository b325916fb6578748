package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.GraftDataSource

/** The registered streaming SINK (`writeStream.format("graft")`):
  * end-to-end micro-batch ingest, restart continuation, the
  * exactly-once ledger (replay skip + torn-attempt sweep), the
  * read-loop with the `graft-changes` source, and the surface
  * refusals (output mode, partitionBy, missing checkpoint). */
class GraftSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_sink_spec").toString

  private def fsOf(loc: String) =
    new Path(loc).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("writeStream format(graft): micro-batches land as routed lake appends; restart continues without dupes") {
    implicit val sqlCtx = spark.sqlContext
    val loc = tmp() + "/lake"
    val cp = tmp() + "/cp"
    val stream = MemoryStream[(Seq[Float], String)]
    def start() = stream.toDF().toDF("vector", "document")
      .writeStream.format("graft")
      .option("path", loc)
      .option("checkpointLocation", cp)
      .option("dim", "4").option("numHashes", "2")
      .start()

    val q1 = start()
    try {
      stream.addData(Seq(1f, 0f, 0f, 0f) -> "a", Seq(0f, 1f, 0f, 0f) -> "b")
      q1.processAllAvailable()
      stream.addData(Seq(0f, 0f, 1f, 0f) -> "c")
      q1.processAllAvailable()
    } finally q1.stop()

    val lake = Lake(spark, LakeConfig(loc, dim = 4, numHashes = 2))
    val afterFirst = lake.read()
    assert(afterFirst.count() === 3)
    // full derive path ran: uuid ids, default metadata, shard routing
    assert(afterFirst.select("id").as[String].collect().forall(_.nonEmpty))
    assert(afterFirst.select("shard").distinct().count() >= 1)

    // restart from the same checkpoint: committed batches replay as
    // no-ops (ledger), new data appends
    val q2 = start()
    try {
      stream.addData(Seq(0f, 0f, 0f, 1f) -> "d")
      q2.processAllAvailable()
    } finally q2.stop()
    assert(lake.read().count() === 4)
    assert(lake.read().select("document").as[String].collect().toSet ===
      Set("a", "b", "c", "d"))
  }

  test("ingestExactlyOnce: head replay skipped; a batch BELOW the ledger head refuses loudly") {
    val loc = tmp() + "/lake"
    val lake = Lake(spark, LakeConfig(loc, dim = 4, numHashes = 2))
    val rows = Seq((Seq(1f, 0f, 0f, 0f), "x")).toDF("vector", "document")
    assert(lake.ingestExactlyOnce(rows, "sink-a", 0L))
    assert(!lake.ingestExactlyOnce(rows, "sink-a", 0L)) // head replay
    assert(lake.read().count() === 1)
    assert(lake.ingestExactlyOnce(rows, "sink-a", 1L))
    // batch 0 arriving when the ledger head is 1 is NOT a replay Spark
    // can produce (the commit log lags by at most one): it means a
    // wiped checkpoint is reusing this sink identity, and skipping
    // would silently drop batches until the count caught up — refuse
    val e = intercept[IllegalArgumentException](
      lake.ingestExactlyOnce(rows, "sink-a", 0L))
    assert(e.getMessage.contains("wiped checkpoint"))
    assert(lake.read().count() === 2)
    // a DIFFERENT sink identity has its own ledger
    assert(lake.ingestExactlyOnce(rows, "sink-b", 0L))
    assert(lake.read().count() === 3)
  }

  test("torn-attempt sweep: a crashed batch's published files are replaced, not duplicated, on replay") {
    val loc = tmp() + "/lake"
    val fs = fsOf(loc)
    val lake = Lake(spark, LakeConfig(loc, dim = 4, numHashes = 2))
    val batch = Seq(
      (Seq(1f, 0f, 0f, 0f), "p"), (Seq(0f, 1f, 0f, 0f), "q"),
      (Seq(0f, 0f, 1f, 0f), "r")).toDF("vector", "document")
    assert(lake.ingestExactlyOnce(batch, "sink-t", 7L))
    assert(lake.read().count() === 3)

    // simulate the crash window: files published (and even the skip/
    // zone refreshes run) but the ledger commit never happened — delete
    // the ledger version and restore a (stale) pend marker. The
    // staleness override stands in for the marker aging past the
    // heartbeat horizon after the JVM died.
    val idHex = Lake.sinkIdHex("sink-t")
    val ledger = new Path(loc, s"_sink.$idHex.7.json")
    assert(fs.exists(ledger), "ledger version should exist after commit")
    fs.delete(ledger, false)
    // the marker carries the REAL attempt id (as a genuine crash would
    // leave it) — the heal path sweeps files by that attempt's tag
    val attempt = lake.read().inputFiles.map(new Path(_).getName)
      .collectFirst { case n if n.startsWith(s"sink-$idHex-7-") =>
        n.stripPrefix(s"sink-$idHex-7-").split("-")(0) }.get
    val pend = new Path(loc, s"_append.$idHex-7-$attempt.lock")
    fs.create(pend, true).close()

    // replay of the same batch: the sweep removes the torn files first,
    // so the lake converges to exactly one copy
    sys.props("graft.sink.pendStaleMs") = "0"
    try assert(lake.ingestExactlyOnce(batch, "sink-t", 7L))
    finally sys.props.remove("graft.sink.pendStaleMs")
    assert(lake.read().count() === 3)
    assert(lake.read().select("document").as[String].collect().sorted ===
      Array("p", "q", "r"))
    assert(!fs.exists(pend), "pend marker cleared after healed commit")
  }

  test("a TORN ledger version (winner unreadable) freezes the heal path: no sweep, marker kept, maintenance blocked") {
    val loc = tmp() + "/lake"
    val fs = fsOf(loc)
    val lake = Lake(spark, LakeConfig(loc, dim = 4, numHashes = 2))
    val batch = Seq(
      (Seq(1f, 0f, 0f, 0f), "p"), (Seq(0f, 1f, 0f, 0f), "q")).toDF("vector", "document")
    assert(lake.ingestExactlyOnce(batch, "sink-tl", 7L))
    assert(lake.read().count() === 2)

    // simulate a TORN ledger write: the version file exists (so the
    // batch counts committed — the filename is the ledger) but the
    // winning attempt is unreadable from its body. Restore a stale pend
    // marker carrying the REAL attempt, as a crash in the commit window
    // would leave it.
    val idHex = Lake.sinkIdHex("sink-tl")
    val ledger = new Path(loc, s"_sink.$idHex.7.json")
    val out = fs.create(ledger, true)
    out.write("{\"sink\": \"".getBytes("UTF-8")) // half-written json
    out.close()
    val attempt = lake.read().inputFiles.map(new Path(_).getName)
      .collectFirst { case n if n.startsWith(s"sink-$idHex-7-") =>
        n.stripPrefix(s"sink-$idHex-7-").split("-")(0) }.get
    val pend = new Path(loc, s"_append.$idHex-7-$attempt.lock")
    fs.create(pend, true).close()

    // the replay takes the skip branch but must sweep NOTHING: the
    // committed files carry SOME attempt's tag and the torn version
    // cannot say whose — deleting the stale attempt's files here could
    // be deleting the committed rows themselves
    sys.props("graft.sink.pendStaleMs") = "0"
    try assert(!lake.ingestExactlyOnce(batch, "sink-tl", 7L))
    finally sys.props.remove("graft.sink.pendStaleMs")
    assert(lake.read().count() === 2, "committed rows survive the torn-ledger replay")
    assert(fs.exists(pend), "marker stays: maintenance blocked loudly until repair")
    intercept[java.util.ConcurrentModificationException](lake.compact())

    // the documented operator heal: fix/inspect, clear the marker
    fs.delete(pend, false)
    lake.compact()
    assert(lake.read().count() === 2)
  }

  test("sink identity migration: a ledger committed under the raw path spelling is adopted, not restarted") {
    val loc = tmp() + "/lake"
    val cp = tmp() + "/cp" // raw spelling; normalization prepends file://
    val lake = Lake(spark, LakeConfig(loc, dim = 4, numHashes = 2))
    val batch = Seq((Seq(1f, 0f, 0f, 0f), "m0")).toDF("vector", "document")
    // a pre-normalization deployment committed batch 0 under the
    // VERBATIM checkpoint string
    assert(lake.ingestExactlyOnce(batch, cp, 0L))
    assert(lake.read().count() === 1)
    // the upgraded sink must bind to that ledger: the replayed head
    // batch (crash in the addBatch->commit-log window) is a no-op, not
    // a duplicate ingest under a fresh normalized identity
    val ds = new GraftDataSource
    val sink = ds.createSink(spark.sqlContext,
      Map("path" -> loc, "dim" -> "4", "numHashes" -> "2",
        "checkpointLocation" -> cp), Nil, OutputMode.Append())
      .asInstanceOf[graft.sources.GraftSink]
    sink.addBatch(0L, batch)
    assert(lake.read().count() === 1, "replayed head must not duplicate")
    // and the adopted identity keeps advancing under the same ledger
    sink.addBatch(1L, Seq((Seq(0f, 1f, 0f, 0f), "m1")).toDF("vector", "document"))
    assert(lake.read().count() === 2)
    assert(lake.hasSinkLedger(cp), "the raw-spelling ledger stays the identity")
  }

  test("sink identity normalizes checkpoint path spellings (trailing slash, scheme, duplicate separators)") {
    val base = GraftDataSource.normalizeCheckpointId(spark, "/tmp/graft_cp_x")
    assert(GraftDataSource.normalizeCheckpointId(spark, "/tmp/graft_cp_x/") === base)
    assert(GraftDataSource.normalizeCheckpointId(spark, "/tmp//graft_cp_x") === base)
    assert(GraftDataSource.normalizeCheckpointId(spark, "file:/tmp/graft_cp_x") === base)
    assert(GraftDataSource.normalizeCheckpointId(spark, "file:///tmp/graft_cp_x") === base)
    // distinct checkpoints stay distinct
    assert(GraftDataSource.normalizeCheckpointId(spark, "/tmp/graft_cp_y") !== base)
  }

  test("a FRESH rival marker for the same batch refuses the attempt (live zombie protection)") {
    val loc = tmp() + "/lake"
    val lake = Lake(spark, LakeConfig(loc, dim = 4, numHashes = 2))
    val batch = Seq((Seq(1f, 0f, 0f, 0f), "z")).toDF("vector", "document")
    assert(lake.ingestExactlyOnce(batch, "sink-z", 0L))
    // a marker freshly heartbeaten by another driver's attempt of batch 1
    val idHex = Lake.sinkIdHex("sink-z")
    val rival = new Path(loc, s"_append.$idHex-1-cafe0001.lock")
    fsOf(loc).create(rival, true).close()
    try {
      // under the DEFAULT staleness horizon the attempt must refuse —
      // sweeping would delete files the live rival is about to commit
      val e = intercept[java.util.ConcurrentModificationException](
        lake.ingestExactlyOnce(batch, "sink-z", 1L))
      assert(e.getMessage.contains("concurrent duplicate driver"))
      assert(lake.read().count() === 1, "refused attempt must publish nothing")
    } finally fsOf(loc).delete(rival, false)
    // rival gone (crashed and aged, or committed+cleared): proceeds
    assert(lake.ingestExactlyOnce(batch, "sink-z", 1L))
    assert(lake.read().count() === 2)
  }

  test("two concurrent attempts of the SAME batch converge to one copy (refusal or ledger arbitration)") {
    val loc = tmp() + "/lake"
    val lake = Lake(spark, LakeConfig(loc, dim = 4, numHashes = 2))
    val batch = Seq(
      (Seq(1f, 0f, 0f, 0f), "r0"), (Seq(0f, 1f, 0f, 0f), "r1"),
      (Seq(0f, 0f, 1f, 0f), "r2")).toDF("vector", "document")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    // race outcomes, all acceptable: one attempt refuses on the other's
    // fresh marker (CME), or both publish and the ledger create picks
    // the winner while the loser removes its own attempt-tagged files.
    // What must NEVER vary: exactly one copy of the batch afterwards.
    val results = scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(Seq.fill(2)(scala.concurrent.Future(
        try Right(lake.ingestExactlyOnce(batch, "race-sink", 0L))
        catch { case e: java.util.ConcurrentModificationException => Left(e) }))),
      scala.concurrent.duration.Duration(180, "s"))
    pool.shutdown()
    val committed = results.collect { case Right(true) => () }.size
    assert(committed >= 1, s"someone must commit the batch: $results")
    assert(lake.read().count() === 3, "exactly one copy of the batch")
    assert(lake.read().select("document").as[String].collect().sorted ===
      Array("r0", "r1", "r2"))
    // the ledger holds the batch; a later replay skips
    assert(!lake.ingestExactlyOnce(batch, "race-sink", 0L))
    // no markers left behind; maintenance proceeds
    lake.compact()
  }

  test("a stranded pend marker blocks maintenance (crashed sink batch = crashed append)") {
    val loc = tmp() + "/lake"
    val lake = Lake(spark, LakeConfig(loc, dim = 4, numHashes = 2))
    lake.ingest(Seq((Seq(1f, 0f, 0f, 0f), "x")).toDF("vector", "document"))
    val pend = new Path(loc, s"_append.${Lake.sinkIdHex("s")}-0-feed0002.lock")
    fsOf(loc).create(pend, true).close()
    try {
      val e = intercept[java.util.ConcurrentModificationException](lake.compact())
      assert(e.getMessage.contains("append"))
    } finally fsOf(loc).delete(pend, false)
    lake.compact() // and clears once the marker is gone
  }

  test("createSink refusals: output mode, partitionBy, missing checkpoint") {
    val loc = tmp() + "/lake"
    val ds = new GraftDataSource
    val params = Map("path" -> loc, "dim" -> "4", "checkpointLocation" -> (tmp() + "/cp"))
    intercept[IllegalArgumentException](
      ds.createSink(spark.sqlContext, params, Nil, OutputMode.Update()))
    intercept[IllegalArgumentException](
      ds.createSink(spark.sqlContext, params, Seq("shard"), OutputMode.Append()))
    intercept[IllegalArgumentException](
      ds.createSink(spark.sqlContext, Map("path" -> loc, "dim" -> "4"),
        Nil, OutputMode.Append()))
    // and the happy path constructs
    ds.createSink(spark.sqlContext, params, Nil, OutputMode.Append())
  }

  test("sink batches flow through the shared derive path: evolved columns land, pre-evolve rows null-fill") {
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val loc = tmp() + "/lake"
    val lake = Lake(spark, LakeConfig(loc, dim = 4, numHashes = 2))
    lake.ingest(Seq((Seq(1f, 0f, 0f, 0f), "a")).toDF("vector", "document"))
    lake.evolve(StructType(Seq(StructField("quality", DoubleType))))
    assert(lake.ingestExactlyOnce(
      Seq((Seq(0f, 1f, 0f, 0f), "b", 0.9)).toDF("vector", "document", "quality"),
      "sink-e", 0L))
    val got = lake.read().select("document", "quality").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got === Map("a" -> None, "b" -> Some(0.9)))
  }

  test("the full SQL-surface loop: readStream(graft-changes) -> writeStream(graft) replicates a lake") {
    val srcLoc = tmp() + "/src"
    val dstLoc = tmp() + "/dst"
    val cp = tmp() + "/cp"
    val src = Lake(spark, LakeConfig(srcLoc, dim = 4, numHashes = 2))
    src.ingest(Seq(
      (Seq(1f, 0f, 0f, 0f), "a"), (Seq(0f, 1f, 0f, 0f), "b"),
      (Seq(0f, 0f, 1f, 0f), "c")).toDF("vector", "document"))

    val q = spark.readStream.format("graft-changes")
      .option("location", srcLoc).option("dim", "4").option("numHashes", "2")
      .load()
      .where($"change" === "insert")
      .select("vector", "document", "metadata", "timestamp")
      .writeStream.format("graft")
      .option("path", dstLoc)
      .option("checkpointLocation", cp)
      .option("dim", "4").option("numHashes", "2")
      .start()
    try {
      q.processAllAvailable()
      src.ingest(Seq((Seq(0f, 0f, 0f, 1f), "d")).toDF("vector", "document"))
      q.processAllAvailable()
    } finally q.stop()

    val dst = Lake(spark, LakeConfig(dstLoc, dim = 4, numHashes = 2))
    assert(dst.read().select("document").as[String].collect().toSet ===
      Set("a", "b", "c", "d"))
    // routing matches the source lake's (same planes, same dims)
    val bySrc = src.read().select("document", "shard")
      .as[(String, Int)].collect().toMap
    val byDst = dst.read().select("document", "shard")
      .as[(String, Int)].collect().toMap
    assert(bySrc === byDst)
  }
}
