package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The per-shard id Bloom skip index: id probes (lookup / deleteIds /
  * upsert's old-version discovery) read only the shards whose sketches
  * might hold the ids; staleness, absence, and corruption all degrade
  * to the exact full probe, never to a wrong answer. */
class SkipIndexSpec extends SparkSpec {
  import spark.implicits._

  private def mkLake(tag: String): Lake = {
    val dir = Files.createTempDirectory(s"graft_skip_$tag").toString
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 5, numHashes = 4))
    val rng = new scala.util.Random(11)
    lake.ingest((0 until 200).map(i =>
      (s"id-$i", Seq.fill(5)(rng.nextGaussian().toFloat), s"doc $i"))
      .toDF("id", "vector", "document"))
    lake
  }

  /** Distinct shard directories the frame's executed scan actually
    * resolved after pruning. */
  private def scannedShards(df: org.apache.spark.sql.DataFrame): Set[String] = {
    df.collect() // force execution so selectedPartitions is resolved
    df.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec => f }
      .flatMap(_.selectedPartitions.toPartitionArray
        .map(_.filePath.toString))
      .flatMap("shard=(\\d+)/".r.findFirstMatchIn(_).map(_.group(1)))
      .toSet
  }

  test("lookup with a fresh index is exact and scans fewer shards") {
    val lake = mkLake("fresh")
    assert(lake.buildSkipIndex(fpp = 0.001) > 0L)
    val totalShards = lake.read().select("shard").distinct().count()
    val want = lake.read().where(col("id") === "id-57")
      .collect().map(_.toString).sorted
    assert(want.nonEmpty)
    val got = lake.lookup(Seq("id-57"))
    assert(got.collect().map(_.toString).sorted.toSeq === want.toSeq)
    val scanned = scannedShards(got)
    assert(scanned.nonEmpty && scanned.size < totalShards,
      s"no skipping: scanned $scanned of $totalShards shards")
  }

  test("a nonexistent id scans nothing and deleteIds of it is a no-op") {
    val lake = mkLake("miss")
    lake.buildSkipIndex(fpp = 0.0001)
    // every sketch rejects the id (at this fpp, deterministically for
    // this seed) -> empty candidate set -> no file scan at all
    val got = lake.lookup(Seq("no-such-id"))
    assert(got.count() === 0L)
    assert(scannedShards(got).isEmpty)
    assert(lake.deleteIds(Seq("no-such-id")) === 0L)
  }

  test("appends after the build stay visible AND keep pruning: ingest refreshes its shards") {
    val lake = mkLake("stale")
    lake.buildSkipIndex(fpp = 0.001)
    // a brand-new id the sketches have never seen, landing in whatever
    // shard its vector routes to — ingest refreshes that shard's sketch
    // post-publish, so the point-read prunes WITHOUT a manual rebuild
    lake.ingest(Seq(("late-1", Seq(9.0f, 9.0f, 9.0f, 9.0f, 9.0f), "late"))
      .toDF("id", "vector", "document"))
    val got = lake.lookup(Seq("late-1"))
    val rows = got.collect()
    assert(rows.length === 1 && rows.head.getAs[String]("document") === "late")
    val totalShards = lake.read().select("shard").distinct().count()
    val scanned = scannedShards(got)
    assert(scanned.nonEmpty && scanned.size < totalShards,
      s"ingest must refresh its shards' sketches: scanned $scanned of $totalShards")
    // ids from the original build remain exact too
    assert(lake.lookup(Seq("id-3")).count() === 1L)
  }

  test("deleteIds with a fresh index deletes exactly the ids") {
    val lake = mkLake("del")
    lake.buildSkipIndex()
    val before = lake.count()
    assert(lake.deleteIds(Seq("id-10", "id-11")) === 2L)
    assert(lake.count() === before - 2)
    assert(lake.lookup(Seq("id-10", "id-11")).count() === 0L)
    // the rewritten shard is now stale; other ids in it still resolve
    assert(lake.read().where(col("id") === "id-12").count() ===
      lake.lookup(Seq("id-12")).count())
  }

  test("upsert's pruned probe replaces without duplicating") {
    val lake = mkLake("upsert")
    lake.buildSkipIndex()
    val replaced = lake.upsert(Seq(
      ("id-5", Seq(1.0f, 0f, 0f, 0f, 0f), "doc 5 v2"),
      ("fresh-1", Seq(0f, 1.0f, 0f, 0f, 0f), "fresh"))
      .toDF("id", "vector", "document"))
    assert(replaced === 1L)
    val r5 = lake.read().where(col("id") === "id-5").collect()
    assert(r5.length === 1 && r5.head.getAs[String]("document") === "doc 5 v2")
    assert(lake.read().where(col("id") === "fresh-1").count() === 1L)
    assert(lake.count() === 201L)
  }

  test("a corrupt index degrades to the exact full probe") {
    val lake = mkLake("corrupt")
    lake.buildSkipIndex()
    val fs = new Path(lake.cfg.location)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val skip = new Path(lake.cfg.location, "_skip")
    fs.delete(skip, true)
    val out = fs.create(new Path(skip, "part-00000.parquet"), true)
    out.write("not parquet".getBytes("UTF-8")); out.close()
    val got = lake.lookup(Seq("id-99")).collect()
    assert(got.length === 1 && got.head.getAs[String]("document") === "doc 99")
    assert(lake.deleteIds(Seq("id-99")) === 1L)
  }

  test("maintenance REFRESHES the index: post-rewrite probes still skip") {
    val lake = mkLake("refresh")
    lake.buildSkipIndex(fpp = 0.001)
    assert(lake.deleteIds(Seq("id-10")) === 1L)
    // the rewrite refreshed the touched shard's sketch in place:
    // zero stale shards, and the point-read still prunes
    assert(lake.validate().head().getAs[Long]("skip_stale") === 0L)
    val totalShards = lake.read().select("shard").distinct().count()
    val scanned = scannedShards(lake.lookup(Seq("id-57")))
    assert(scanned.nonEmpty && scanned.size < totalShards)
    lake.upsert(Seq(("id-57", Seq(2f, 0f, 0f, 0f, 0f), "v2"))
      .toDF("id", "vector", "document"))
    assert(lake.validate().head().getAs[Long]("skip_stale") === 0L)
    // full compact rewrites every shard -> full refresh
    lake.compact()
    assert(lake.validate().head().getAs[Long]("skip_stale") === 0L)
    val scanned2 = scannedShards(lake.lookup(Seq("id-57")))
    assert(scanned2.nonEmpty && scanned2.size < totalShards)
    assert(lake.lookup(Seq("id-57")).head().getAs[String]("document") === "v2")
  }

  test("validate reports index health: -1 absent, 0 fresh, and appends KEEP it 0") {
    val lake = mkLake("health")
    assert(lake.validate().head().getAs[Long]("skip_stale") === -1L)
    lake.buildSkipIndex()
    assert(lake.validate().head().getAs[Long]("skip_stale") === 0L)
    // ingest refreshes the shards it touched — the index stays fresh
    // across plain appends, not just maintenance rewrites
    lake.ingest(Seq(("x1", Seq(1f, 1f, 1f, 1f, 1f), "x"))
      .toDF("id", "vector", "document"))
    assert(lake.validate().head().getAs[Long]("skip_stale") === 0L)
    assert(lake.lookup(Seq("x1")).count() === 1L)
  }

  test("a missed refresh (crash window) leaves a stale index: probes exact") {
    val lake = mkLake("crashwin")
    lake.buildSkipIndex()
    val fs = new Path(lake.cfg.location)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val skip = new Path(lake.cfg.location, "_skip")
    val saved = new Path(s"${lake.cfg.location}__savedskip")
    org.apache.hadoop.fs.FileUtil.copy(fs, skip, fs, saved, false,
      spark.sparkContext.hadoopConfiguration)
    lake.compact()
    // simulate a crash between the maintenance commit and its index
    // refresh: the PRE-compact index is what's on disk
    fs.delete(skip, true)
    fs.rename(saved, skip)
    val audit = lake.validate().head()
    assert(audit.getAs[Long]("skip_stale") > 0L) // loudly visible
    // every fingerprint mismatches -> every probe exact, nothing wrong
    assert(lake.lookup(Seq("id-42")).count() === 1L)
    assert(lake.deleteIds(Seq("id-42")) === 1L)
    // rebuilding restores skipping
    assert(lake.buildSkipIndex(fpp = 0.001) > 0L)
    val totalShards = lake.read().select("shard").distinct().count()
    val scanned = scannedShards(lake.lookup(Seq("id-7")))
    assert(scanned.nonEmpty && scanned.size < totalShards)
  }
}
