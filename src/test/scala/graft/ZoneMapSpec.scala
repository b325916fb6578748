package graft

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.functions._

/** The per-file timestamp zone map: time-window reads open only the
  * files whose [min_ts, max_ts] can intersect the window, stay exactly
  * equal to the unpruned filtered read through appends / rewrites /
  * missing entries, and never go wrong — files are immutable, so a
  * mapped range never stales; an unmapped file is merely scanned. */
class ZoneMapSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.from(Instant.ofEpochSecond(day.toLong * 86400))
  private def inst(day: Int): Instant = Instant.ofEpochSecond(day.toLong * 86400)

  /** One day's batch: 8 rows, distinct vectors, all stamped `day`. */
  private def batch(day: Int) =
    (0 until 8).map { i =>
      (s"d$day-r$i", Seq(math.sin(day * 10 + i).toFloat,
        math.cos(day * 3 + i).toFloat, (i - 4).toFloat / 4), s"doc $day $i", ts(day))
    }.toDF("id", "vector", "document", "timestamp")

  private def freshLake(): Lake = {
    val dir = Files.createTempDirectory("graft_zone").toString
    Lake(spark, LakeConfig(s"$dir/lake", dim = 3, numHashes = 2))
  }

  private def windowRows(lake: Lake, lo: Int, hi: Int) =
    lake.readTimeRange(inst(lo), inst(hi))
      .select("id").collect().map(_.getString(0)).toSet
  private def fullRows(lake: Lake, lo: Int, hi: Int) =
    lake.read().where(col("timestamp").between(ts(lo), ts(hi)))
      .select("id").collect().map(_.getString(0)).toSet

  test("a supplied ingest timestamp SURVIVES; absent or null falls back to now()") {
    val lake = freshLake()
    lake.ingest(batch(5))
    val stored = lake.read().select("id", "timestamp").collect()
      .map(r => r.getString(0) -> r.getTimestamp(1)).toMap
    assert(stored("d5-r0") === ts(5), "explicit event time must be stored")
    lake.ingest(Seq(("now-row", Seq(1f, 1f, 1f), "d"))
      .toDF("id", "vector", "document"))
    val auto = lake.read().where(col("id") === "now-row")
      .select("timestamp").head().getTimestamp(0)
    assert(math.abs(auto.getTime - System.currentTimeMillis()) < 600000L,
      "absent timestamp must default to ingest time")
    // a NUMERIC timestamp column is refused (epoch unit is ambiguous —
    // a millis source cast as seconds lands ~50,000 years out silently)
    val e = intercept[IllegalArgumentException](lake.ingest(
      Seq(("num-row", Seq(1f, 0f, 0f), "d", 1700000000000L))
        .toDF("id", "vector", "document", "timestamp")))
    assert(e.getMessage.contains("timestamp_seconds"))
  }

  test("window reads prune to the window's files and equal the unpruned filtered read") {
    val lake = freshLake()
    (1 to 4).foreach(d => lake.ingest(batch(d)))
    assert(lake.buildZoneMap() > 0L)
    // correctness: every window, pruned == full
    Seq((1, 1), (2, 3), (1, 4), (5, 9)).foreach { case (lo, hi) =>
      assert(windowRows(lake, lo, hi) === fullRows(lake, lo, hi),
        s"window [$lo,$hi] must match the unpruned read")
    }
    assert(windowRows(lake, 2, 2) === batch(2).select("id").collect()
      .map(_.getString(0)).toSet)
    // pruning: the one-day window must open strictly fewer files than
    // the lake holds, and none of them may be provably outside the
    // window per the map
    val pruned = lake.readTimeRange(inst(2), inst(2))
    val prunedFiles = pruned.inputFiles.toSet
    val allFiles = lake.read().inputFiles.toSet
    assert(prunedFiles.nonEmpty && prunedFiles.size < allFiles.size,
      s"expected a strict file cut: ${prunedFiles.size} of ${allFiles.size}")
    // an empty window opens NO files
    assert(lake.readTimeRange(inst(50), inst(60)).inputFiles.isEmpty)
    assert(windowRows(lake, 50, 60) === Set.empty[String])
  }

  test("distributed verdict regime: past the file bound the prune runs as a join, equal rows and equal file cut") {
    // the at-scale path (graft.zone.distributedVerdictMinFiles): the
    // per-file verdict pass moves off the driver and only the
    // surviving file list collects. Forcing the bound to 0 runs EVERY
    // prune through the join — rows and file cuts must be
    // indistinguishable from the driver-map regime, including the
    // unmapped-file scan-unconditionally rule.
    val lake = freshLake()
    (1 to 4).foreach(d => lake.ingest(batch(d)))
    assert(lake.buildZoneMap() > 0L)
    lake.ingest(batch(9)) // post-build append: mapped by the refresh
    val driverRegime = Seq((1, 1), (2, 3), (1, 4), (5, 9), (50, 60)).map {
      case (lo, hi) => (windowRows(lake, lo, hi),
        lake.readTimeRange(inst(lo), inst(hi)).inputFiles.toSet)
    }
    spark.conf.set("graft.zone.distributedVerdictMinFiles", "0")
    try {
      Seq((1, 1), (2, 3), (1, 4), (5, 9), (50, 60)).zip(driverRegime)
        .foreach { case ((lo, hi), (rows, files)) =>
          assert(windowRows(lake, lo, hi) === rows,
            s"window [$lo,$hi]: distributed verdict changed the rows")
          assert(windowRows(lake, lo, hi) === fullRows(lake, lo, hi))
          assert(lake.readTimeRange(inst(lo), inst(hi)).inputFiles.toSet
            === files,
            s"window [$lo,$hi]: distributed verdict changed the file cut")
        }
      // freshness-scoped kNN rides the same base — exercise it too
      // (single-probe contract: the filtered twin carries the same
      // routed-shard predicate)
      val q = Seq(0.1, 0.2, 0.3)
      val viaZone = lake.topKInRange(q, 5, inst(2), inst(3))
        .select("id").collect().map(_.getString(0)).toSeq
      val viaFilter = lake.topKFiltered(q, 5,
        col("timestamp").between(ts(2), ts(3)) &&
          col("shard") === lake.lsh.shardOf(q))
        .select("id").collect().map(_.getString(0)).toSeq
      assert(viaZone === viaFilter)
    } finally spark.conf.unset("graft.zone.distributedVerdictMinFiles")
  }

  test("appends refresh the map; an unmapped file is scanned, never dropped") {
    val lake = freshLake()
    (1 to 2).foreach(d => lake.ingest(batch(d)))
    assert(lake.buildZoneMap() > 0L)
    // append AFTER the build: the ingest-side refresh must map the new
    // files with no manual rebuild — day 3's window still prunes day 1/2
    lake.ingest(batch(3))
    assert(windowRows(lake, 3, 3) === fullRows(lake, 3, 3))
    val d3 = lake.readTimeRange(inst(3), inst(3))
    assert(d3.inputFiles.toSet.size < lake.read().inputFiles.toSet.size,
      "post-build appends must be mapped (else day 3 reads everything)")
    // sabotage: drop day 3's entries from the map — its files become
    // UNMAPPED and must be scanned unconditionally (correct, unpruned)
    val fs = new org.apache.hadoop.fs.Path(lake.cfg.location)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val zone = new org.apache.hadoop.fs.Path(lake.cfg.location, "_zone")
    val kept = spark.read.parquet(zone.toString)
      .where(col("max_ts") < ts(3)).cache()
    kept.count()
    val tmp = new org.apache.hadoop.fs.Path(lake.cfg.location, "_zone_new")
    kept.coalesce(1).write.parquet(tmp.toString)
    kept.unpersist()
    fs.delete(zone, true)
    fs.rename(tmp, zone)
    assert(windowRows(lake, 3, 3) === fullRows(lake, 3, 3),
      "unmapped files must still be scanned")
    assert(windowRows(lake, 1, 1) === fullRows(lake, 1, 1))
  }

  test("rewrites and compaction keep window reads exact; rewritten files get re-mapped") {
    val lake = freshLake()
    (1 to 3).foreach(d => lake.ingest(batch(d)))
    assert(lake.buildZoneMap() > 0L)
    // a delete rewrites its shards: new file names, old entries dead
    assert(lake.deleteWhere(col("id") === "d2-r0") === 1L)
    Seq((1, 1), (2, 2), (3, 3), (1, 3)).foreach { case (lo, hi) =>
      assert(windowRows(lake, lo, hi) === fullRows(lake, lo, hi),
        s"window [$lo,$hi] after deleteWhere")
    }
    assert(!windowRows(lake, 2, 2).contains("d2-r0"))
    // the rewrite-side refresh re-mapped the new files: day 1 alone
    // still opens fewer files than the lake holds
    assert(lake.readTimeRange(inst(1), inst(1)).inputFiles.toSet.size <
      lake.read().inputFiles.toSet.size)
    // full compact rewrites EVERY file; the refresh re-maps them all.
    // Compacted files MIX the days (each spans [1,3]), so a day window
    // legitimately prunes nothing — the re-mapping proof is a window
    // OUTSIDE the lake's whole range opening ZERO files (unmapped
    // files would all be scanned)
    lake.compact()
    Seq((1, 1), (2, 2), (1, 3)).foreach { case (lo, hi) =>
      assert(windowRows(lake, lo, hi) === fullRows(lake, lo, hi),
        s"window [$lo,$hi] after compact")
    }
    assert(lake.readTimeRange(inst(50), inst(60)).inputFiles.isEmpty,
      "compact's rewrite must be re-mapped, not degrade to a full scan")
    // rebuild compacts dead entries away and stays correct
    assert(lake.buildZoneMap() > 0L)
    assert(windowRows(lake, 2, 2) === fullRows(lake, 2, 2))
  }

  test("topKInRange: freshness-scoped kNN equals the filtered exact answer and cuts files by BOTH window and shard") {
    val lake = freshLake()
    (1 to 4).foreach(d => lake.ingest(batch(d)))
    assert(lake.buildZoneMap() > 0L)
    val q = Seq(math.sin(25.0), math.cos(7.0), -0.5) // near day 2's rows
    val routed = lake.lsh.shardOf(q)
    def filteredTwin(lo: Int, hi: Int, shards: Seq[Int]) =
      lake.topKFiltered(q, 3,
        col("timestamp").between(ts(lo), ts(hi)) &&
          col("shard").isin(shards: _*))
        .select("id", "dist").collect().map(r => (r.getString(0), r.getDouble(1)))
    // single-probe answer == the unpruned filtered exact answer
    val got = lake.topKInRange(q, 3, inst(2), inst(3))
    assert(got.select("id", "dist").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq ===
      filteredTwin(2, 3, Seq(routed)).toSeq)
    // the full Hamming<=1 ladder == the filtered multiprobe set
    val ladder = routed +: (0 until 2).map(j => routed ^ (1 << j))
    val gotMp = lake.topKInRange(q, 3, inst(2), inst(3), nprobe = 3)
    assert(gotMp.select("id", "dist").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq ===
      filteredTwin(2, 3, ladder).toSeq)
    // BOTH cuts show in files opened: fewer than the window-only read
    // (shard cut) and fewer than the whole lake (window cut)
    val inRangeFiles = got.inputFiles.toSet
    assert(inRangeFiles.size < lake.readTimeRange(inst(2), inst(3))
      .inputFiles.toSet.size, "the shard cut must drop window files")
    assert(inRangeFiles.size < lake.read().inputFiles.toSet.size)
    // an empty window answers empty and opens nothing
    assert(lake.topKInRange(q, 3, inst(50), inst(60)).count() === 0L)
    assert(lake.topKInRange(q, 3, inst(50), inst(60)).inputFiles.isEmpty)
  }

  test("field zone map: readFieldRange prunes by a nested numeric field's per-file range; refreshes carry the spec") {
    val dir = Files.createTempDirectory("graft_zone_field").toString
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 3, numHashes = 2))
    // each batch's `q` field occupies a distinct band, so per-file
    // (min, max) ranges separate cleanly
    def batchQ(band: Int) = (0 until 8).map { i =>
      val q = band * 100 + i
      (s"b$band-$i", Seq(math.sin(band * 9 + i).toFloat, 1f, -0.2f * i),
        s"doc $band $i", s"""{"q": $q, "tag": "t$band"}""")
    }.toDF("id", "vector", "document", "metadata_json")
    (1 to 3).foreach(b => lake.ingest(batchQ(b)))
    assert(lake.buildZoneMap(fields = Seq("q")) > 0L)
    def fieldRows(lo: Double, hi: Double) =
      lake.readFieldRange("q", lo, hi)
        .select("id").collect().map(_.getString(0)).toSet
    def fullRows(lo: Double, hi: Double) =
      lake.read().where(lake.metadataField("q").cast("double").between(lo, hi))
        .select("id").collect().map(_.getString(0)).toSet
    // correctness across bands; pruning on a one-band window
    Seq((100.0, 199.0), (150.0, 250.0), (0.0, 999.0)).foreach { case (lo, hi) =>
      assert(fieldRows(lo, hi) === fullRows(lo, hi), s"field window [$lo,$hi]")
    }
    val band2 = lake.readFieldRange("q", 200.0, 299.0)
    assert(band2.inputFiles.toSet.size < lake.read().inputFiles.toSet.size,
      "a one-band field window must open fewer files")
    // a post-build append recomputes the SPEC'd field (the refresh
    // reads _spec.json) — band 4 is pruned-read correctly and band 1
    // windows don't open its files
    lake.ingest(batchQ(4))
    assert(fieldRows(400.0, 499.0) === fullRows(400.0, 499.0))
    assert(lake.readFieldRange("q", 400.0, 499.0).inputFiles.toSet.size <
      lake.read().inputFiles.toSet.size,
      "post-build appends must carry the field ranges")
    // SABOTAGE: a refresh that cannot read the spec writes a part
    // WITHOUT the field columns (fp of the empty list) — those files
    // must be SCANNED by field reads, never pruned by null ranges
    val fs2 = new org.apache.hadoop.fs.Path(lake.cfg.location)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val spec = new org.apache.hadoop.fs.Path(lake.cfg.location, "_zone/_spec.json")
    fs2.delete(spec, false)
    lake.ingest(batchQ(5)) // refresh runs with fields = Nil
    val out = fs2.create(spec, false)
    out.write("""{"fields": ["q"]}""".getBytes("UTF-8")); out.close()
    assert(fieldRows(500.0, 599.0) === fullRows(500.0, 599.0),
      "files mapped under a failed spec read must be scanned, not pruned")
    assert(fieldRows(100.0, 199.0) === fullRows(100.0, 199.0))
    // an UNMAPPED path falls back to the plain filtered read — same rows
    assert(lake.readFieldRange("tag_len_never_mapped", 0, 9).count() === 0L)
    // rows whose field is absent/non-numeric never match, both paths
    lake.ingest(Seq(("no-q", Seq(0.5f, 0.5f, 0.5f), "d", """{"tag": "x"}"""))
      .toDF("id", "vector", "document", "metadata_json"))
    assert(!fieldRows(0.0, 9999.0).contains("no-q"))
    assert(fieldRows(0.0, 9999.0) === fullRows(0.0, 9999.0))
    // REWRITES: deleteWhere and a full compact re-map their new files
    // with the SPEC'd field (refreshZoneMapShards reads _spec.json and
    // recomputes q's ranges) — field reads stay exact, and a band
    // outside the whole value space still opens zero files after the
    // compact rewrote every file
    assert(lake.deleteWhere(col("id") === "b2-0") === 1L)
    Seq((100.0, 199.0), (200.0, 299.0), (400.0, 499.0)).foreach {
      case (lo, hi) =>
        assert(fieldRows(lo, hi) === fullRows(lo, hi),
          s"field window [$lo,$hi] after deleteWhere")
    }
    assert(!fieldRows(200.0, 299.0).contains("b2-0"))
    lake.compact()
    assert(fieldRows(100.0, 999.0) === fullRows(100.0, 999.0))
    assert(lake.readFieldRange("q", 5000.0, 6000.0).inputFiles.isEmpty,
      "compact's rewrite must re-map the field ranges, not degrade to scan")
  }

  test("a MALFORMED string timestamp fails the ingest loudly; parseable strings and nulls still work") {
    val lake = freshLake()
    // parseable string → stored as its event time (the survival contract)
    lake.ingest(Seq(("s-row", Seq(1f, 0f, 0f), "d", "1970-01-06 00:00:00"))
      .toDF("id", "vector", "document", "timestamp"))
    assert(lake.read().where(col("id") === "s-row")
      .select("timestamp").head().getTimestamp(0) === ts(5))
    // NULL value → defaults to now() (only absent/null are defaulted)
    lake.ingest(Seq(("n-row", Seq(0f, 1f, 0f), "d", null: String))
      .toDF("id", "vector", "document", "timestamp"))
    val auto = lake.read().where(col("id") === "n-row")
      .select("timestamp").head().getTimestamp(0)
    assert(math.abs(auto.getTime - System.currentTimeMillis()) < 600000L)
    // malformed → LOUD per-row refusal, never a silent rewrite of the
    // event time to ingest time (which would corrupt readTimeRange
    // semantics for backfills)
    val before = lake.read().count()
    val e = intercept[Throwable](lake.ingest(
      Seq(("bad-row", Seq(0f, 0f, 1f), "d", "06/01/1970 about noonish"))
        .toDF("id", "vector", "document", "timestamp")))
    var c: Throwable = e; var found = false
    while (c != null && !found) {
      found = Option(c.getMessage).exists(_.contains("unparseable `timestamp`"))
      c = c.getCause
    }
    assert(found, s"expected the unparseable-timestamp refusal, got: $e")
    assert(lake.read().count() === before,
      "a refused ingest must publish nothing (staged write)")
  }

  test("append-heavy lakes keep a BOUNDED _zone part count: refreshes auto-compact past the cap") {
    val prev = sys.props.get("graft.zone.partCap")
    sys.props("graft.zone.partCap") = "2"
    try {
      val dir = Files.createTempDirectory("graft_zone_cap").toString
      val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 3, numHashes = 2))
      def batchQ(band: Int) = (0 until 8).map { i =>
        (s"b$band-$i", Seq(math.sin(band * 9 + i).toFloat, 1f, -0.2f * i),
          s"doc $band $i", ts(band), s"""{"q": ${band * 100 + i}}""")
      }.toDF("id", "vector", "document", "timestamp", "metadata_json")
      lake.ingest(batchQ(1))
      assert(lake.buildZoneMap(fields = Seq("q")) > 0L)
      (2 to 7).foreach(b => lake.ingest(batchQ(b)))
      val fs = new org.apache.hadoop.fs.Path(lake.cfg.location)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val parts = fs.listStatus(
        new org.apache.hadoop.fs.Path(lake.cfg.location, "_zone"))
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      assert(parts.length <= 3,
        s"7 appends at cap 2 must leave a compacted map, got ${parts.length} parts")
      assert(fs.exists(new org.apache.hadoop.fs.Path(
        lake.cfg.location, "_zone/_spec.json")),
        "compaction must carry the field spec across the swap")
      // exactness and pruning both survive compaction — time AND field
      def ids(df: org.apache.spark.sql.DataFrame) =
        df.select("id").collect().map(_.getString(0)).toSet
      Seq((1, 2), (4, 4), (1, 7)).foreach { case (lo, hi) =>
        assert(ids(lake.readTimeRange(inst(lo), inst(hi))) ===
          ids(lake.read().where(col("timestamp").between(ts(lo), ts(hi)))),
          s"time window [$lo,$hi] after compaction")
      }
      assert(lake.readTimeRange(inst(4), inst(4)).inputFiles.toSet.size <
        lake.read().inputFiles.toSet.size, "time pruning survives compaction")
      assert(ids(lake.readFieldRange("q", 300.0, 399.0)) ===
        ids(lake.read().where(
          lake.metadataField("q").cast("double").between(300.0, 399.0))))
      assert(lake.readFieldRange("q", 300.0, 399.0).inputFiles.toSet.size <
        lake.read().inputFiles.toSet.size, "field pruning survives compaction")
    } finally {
      prev match {
        case Some(v) => sys.props("graft.zone.partCap") = v
        case None => sys.props.remove("graft.zone.partCap"); ()
      }
    }
  }

  test("no map, no harm: readTimeRange without buildZoneMap is the plain filtered read") {
    val lake = freshLake()
    (1 to 2).foreach(d => lake.ingest(batch(d)))
    assert(windowRows(lake, 2, 2) === fullRows(lake, 2, 2))
    assert(windowRows(lake, 2, 2).nonEmpty)
  }
}
