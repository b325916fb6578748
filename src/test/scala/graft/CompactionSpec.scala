package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Small-files maintenance: many appends fragment shards into many tiny
  * files; compact() must merge them to ~target-size files per shard
  * while preserving every row, the shard routing, and queryability. */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def fileCount(lake: Lake): Long = {
    val fs = new Path(lake.cfg.location)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    lake.liveDirPaths().map { case (_, p) =>
      fs.listStatus(p).count(f =>
        f.isFile && f.getPath.getName.endsWith(".parquet")).toLong
    }.sum
  }

  test("compact merges per-shard fragments, preserves rows and queries") {
    val dir = Files.createTempDirectory("graft_compact").toString
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 5, numHashes = 2))
    val rng = new scala.util.Random(7)
    // 6 separate appends -> >= 6 files in every touched shard dir
    val batches = Seq.fill(6)(Seq.fill(20)(Seq.fill(5)(rng.nextGaussian().toFloat)))
    batches.foreach { vs =>
      lake.ingest(vs.zipWithIndex.map { case (v, i) => (v, s"doc $i") }
        .toDF("vector", "document"))
    }
    val before = fileCount(lake)
    val shards = lake.read().select("shard").distinct().count()
    assert(before > shards, s"expected fragmentation, got $before files / $shards shards")

    val preRows = lake.read()
      .select(col("document"), col("shard"), V(col("vector")))
      .collect().map(_.toString).sorted
    val after = lake.compact()

    // one file per shard at this size (far below the default target)
    assert(after === shards, s"after=$after shards=$shards")
    assert(fileCount(lake) === after)
    val postRows = lake.read()
      .select(col("document"), col("shard"), V(col("vector")))
      .collect().map(_.toString).sorted
    assert(postRows.toSeq === preRows.toSeq) // rows + routing bit-preserved
    assert(lake.topKExact(Seq(1.0, 0, 0, 0, 0), 3).count() === 3L)
  }

  test("compact splits an oversized shard into multiple target-sized files") {
    val dir = Files.createTempDirectory("graft_compact_split").toString
    // single shard (0 hyperplanes is invalid; use partitionKey to pin one)
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 4,
      partitionKey = Some("bucket"),
      partitionKeyType = org.apache.spark.sql.types.IntegerType))
    val rng = new scala.util.Random(3)
    lake.ingest(Seq.fill(4000)(Seq.fill(4)(rng.nextGaussian().toFloat))
      .zipWithIndex.map { case (v, i) => (v, s"doc $i", 1) }
      .toDF("vector", "document", "bucket"))
    // tiny target forces ceil(bytes/target) > 1 slices for the one shard
    val files = lake.compact(targetBytes = 16L * 1024)
    assert(files > 1, s"expected a split, got $files file(s)")
    assert(lake.count() === 4000L)
  }

  test("compact preserves escaped and null partition values (no silent drop)") {
    val dir = Files.createTempDirectory("graft_compact_esc").toString
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 2,
      partitionKey = Some("bucket"),
      partitionKeyType = org.apache.spark.sql.types.StringType))
    // ':' and '%' are Spark-escaped to %XX in partition directory names
    // and null becomes the Hive default-partition sentinel; read()
    // returns the DECODED values, so a naive dir-name join would drop
    // all four buckets' rows and the swap would make the loss permanent
    val rows = Seq(
      (Seq(1f, 0f), "colon", "a:b"),
      (Seq(0f, 1f), "pct", "p%3Aq"),
      (Seq(1f, 1f), "space", "x y"),
      (Seq(0f, 2f), "null-bucket", null))
    lake.ingest(rows.toDF("vector", "document", "bucket"))
    lake.ingest(rows.toDF("vector", "document", "bucket")) // fragment
    assert(lake.compact() >= 4L)
    val got = lake.read().groupBy("bucket").count()
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(got === Map(Some("a:b") -> 2L, Some("p%3Aq") -> 2L,
      Some("x y") -> 2L, None -> 2L))
  }

  test("compact(clusterBy) locally sorts each rewritten file, rows unchanged") {
    val dir = Files.createTempDirectory("graft_compact_cluster").toString
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 2, numHashes = 2))
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map(i =>
      (Seq(rnd.nextGaussian().toFloat, rnd.nextGaussian().toFloat), f"doc-${rnd.nextInt(10000)}%05d"))
    lake.ingest(rows.toDF("vector", "document"))
    lake.ingest(rows.toDF("vector", "document")) // fragment
    lake.compact(clusterBy = Seq(col("document")))
    assert(lake.count() === 800L)
    // every file must be internally sorted by the clustering column —
    // that local order is what tightens parquet min/max stats
    val perFile = lake.read()
      .select(input_file_name().as("f"), col("document"))
      .collect().groupBy(_.getString(0))
      .map { case (_, rs) => rs.map(_.getString(1)).toSeq }
    assert(perFile.nonEmpty)
    perFile.foreach(docs => assert(docs === docs.sorted, "file not clustered"))
  }

  test("compact(clusterBy=timestamp) range-bands files: the zone map still prunes after the rewrite") {
    // time-correlated ingest gives naturally banded files; a HASH-sliced
    // compaction merges every band into every file (each file spans the
    // whole time range — zone pruning dead), while clusterBy slices by
    // RANGE so each file covers one contiguous band and the window read
    // keeps opening O(window) files
    def build(tag: String): Lake = {
      val dir = Files.createTempDirectory(s"graft_compact_band_$tag").toString
      val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 4,
        partitionKey = Some("bucket"),
        partitionKeyType = org.apache.spark.sql.types.IntegerType))
      val rnd = new scala.util.Random(11)
      (0 until 8).foreach { day =>
        lake.ingest((0 until 500).map { i =>
          (Seq.fill(4)(rnd.nextGaussian().toFloat), s"d$day-$i", 1,
            java.sql.Timestamp.from(
              java.time.Instant.ofEpochSecond(day.toLong * 86400 + i)))
        }.toDF("vector", "document", "bucket", "timestamp"))
      }
      lake
    }
    def windowFiles(lake: Lake): (Long, Long) = {
      lake.buildZoneMap()
      val df = lake.readTimeRange(java.time.Instant.ofEpochSecond(0L),
        java.time.Instant.ofEpochSecond(86399L))
      (df.inputFiles.length.toLong, fileCount(lake))
    }

    val hashed = build("hash")
    assert(hashed.compact(targetBytes = 24L * 1024) > 2L,
      "target must force a multi-file split for the contrast to exist")
    val (hashWin, hashTotal) = windowFiles(hashed)
    assert(hashWin === hashTotal,
      s"hash slicing spans every file across every band ($hashWin of $hashTotal)")

    val banded = build("range")
    assert(banded.compact(targetBytes = 24L * 1024,
      clusterBy = Seq(col("timestamp"))) > 2L)
    val (bandWin, bandTotal) = windowFiles(banded)
    assert(bandWin < bandTotal,
      s"range slicing must keep the window pruned ($bandWin of $bandTotal)")
    assert(bandWin * 2 <= bandTotal,
      s"expected a material cut, got $bandWin of $bandTotal")
    // identical rows either way
    assert(banded.count() === hashed.count())
    assert(banded.readTimeRange(java.time.Instant.ofEpochSecond(0L),
      java.time.Instant.ofEpochSecond(86399L)).count() === 500L)
  }

  test("unescapePartitionValue: foreign signed-hex forms pass through literally") {
    val dir = Files.createTempDirectory("graft_unesc").toString
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 2))
    // Integer.parseInt(_, 16) accepts "+4"/"-4"; a foreign/corrupt dir
    // value like "k%+4" must NOT decode "+4" to control char 0x04
    assert(lake.unescapePartitionValue("k%+4") === Some("k%+4"))
    assert(lake.unescapePartitionValue("k%-4") === Some("k%-4"))
    // genuine two-nibble escapes still decode (Spark's own output)
    assert(lake.unescapePartitionValue("a%3Ab") === Some("a:b"))
    assert(lake.unescapePartitionValue("p%25q") === Some("p%q"))
    // truncated escape at end-of-string stays literal
    assert(lake.unescapePartitionValue("x%2") === Some("x%2"))
    assert(lake.unescapePartitionValue("__HIVE_DEFAULT_PARTITION__") === None)
  }

  test("compact refuses a streaming-sink lake (_spark_metadata present)") {
    val dir = Files.createTempDirectory("graft_compact_stream").toString
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 3, numHashes = 2))
    lake.ingest(Seq((Seq(1f, 0f, 0f), "d")).toDF("vector", "document"))
    val p = new Path(s"${lake.currentGenDir}/_spark_metadata")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p)
    val e = intercept[IllegalArgumentException] { lake.compact() }
    assert(e.getMessage.contains("_spark_metadata"))
  }

  test("compact leaves root-level model dirs (_pq/_ivf) and old readers intact; vacuum sweeps dead gens") {
    val dir = Files.createTempDirectory("graft_compact_models").toString
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 3, numHashes = 2))
    lake.ingest(Seq((Seq(1f, 0f, 0f), "a"), (Seq(0f, 1f, 0f), "b"))
      .toDF("vector", "document"))
    lake.ingest(Seq((Seq(0f, 0f, 1f), "c")).toDF("vector", "document"))
    val fs = new Path(lake.cfg.location)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a persisted model dir next to the data generations — the thing a
    // whole-root swap used to destroy (round-6 ADVICE, high)
    val model = new Path(s"${lake.cfg.location}/_pq/centroids.parquet")
    val out = fs.create(model, false); out.write(7); out.close()
    // a reader plans BEFORE the compact: its files must survive the op
    val preCompact = lake.read()
    val preGen = lake.currentGenDir
    assert(lake.compact() >= 1L)
    assert(fs.exists(model), "compact must not touch root-level model dirs")
    assert(lake.currentGenDir !== preGen, "compact commits a new generation")
    assert(preCompact.count() === 3L,
      "a pre-compact reader still scans the old generation (nothing deleted)")
    assert(fs.exists(new Path(preGen)), "old generation stays until vacuum")
    assert(lake.vacuum() >= 1L, "vacuum sweeps the dead generation")
    assert(!fs.exists(new Path(preGen)))
    assert(fs.exists(model), "vacuum must not touch model dirs either")
    assert(lake.count() === 3L)
  }

  test("compactIncremental rewrites only fragmented shards; clean dirs stay bit-identical") {
    val dir = Files.createTempDirectory("graft_compact_inc").toString
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 5, numHashes = 2))
    val rng = new scala.util.Random(11)
    // fragment every shard with 6 appends, then fully compact once
    Seq.fill(6)(Seq.fill(20)(Seq.fill(5)(rng.nextGaussian().toFloat))).foreach { vs =>
      lake.ingest(vs.zipWithIndex.map { case (v, i) => (v, s"doc $i") }
        .toDF("vector", "document"))
    }
    lake.compact()
    val fs = new Path(lake.cfg.location)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dirFiles(): Map[String, Set[String]] =
      lake.liveDirPaths().map { case (d, p) =>
        s"$p" -> fs.listStatus(p).filter(_.isFile).map(f =>
          s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}").toSet
      }.toMap
    // re-fragment ONE shard with 6 tiny appends routed to it: take an
    // existing row's vector so the route is deterministic
    val probe = lake.read().select("vector").head()
      .getAs[scala.collection.Seq[Float]]("vector").toSeq
    val dirtyShard = lake.lsh.shardOf(probe.map(_.toDouble))
    (0 until 6).foreach { i =>
      lake.ingest(Seq((probe, s"extra $i")).toDF("vector", "document"))
    }
    val clean = dirFiles().filterNot(_._1.contains(s"shard=$dirtyShard"))
    val preRows = lake.count()
    assert(lake.compactIncremental(maxFilesPerShard = 4) === 1L,
      "exactly the re-fragmented shard is dirty")
    assert(lake.count() === preRows)
    val after = dirFiles()
    clean.foreach { case (d, fsig) =>
      assert(after(d) === fsig, s"clean dir $d was rewritten")
    }
    // the dirty shard's live copy is now a single consolidated dir
    val dirtyLive = lake.liveDirPaths().filter(_._1 == s"shard=$dirtyShard")
    assert(dirtyLive.size === 1, s"dirty shard consolidated: $dirtyLive")
    assert(lake.compactIncremental(maxFilesPerShard = 4) === 0L,
      "second pass finds nothing dirty")
  }

  // stable per-row vector rendering for set comparison
  private def V(c: org.apache.spark.sql.Column) =
    concat_ws(",", c.cast("array<string>")).as("v")
}
