package graft

import java.nio.file.Files

/** vacuum(retainMs): the reader-safety dial of the generation layout.
  * A superseded generation is only swept once it has been dead longer
  * than the window (death = mtime of the first sidecar commit that no
  * longer references it), so a reader that resolved its file list
  * before a maintenance commit keeps scanning valid files for at least
  * `retainMs`, and [[Lake.readAt]] snapshots stay servable for the
  * window — the VACUUM-retention posture of log-structured table
  * formats, on the same one-sidecar-write commit protocol. */
class VacuumRetentionSpec extends SparkSpec {
  import spark.implicits._

  private def freshLake(): (Lake, String) = {
    val dir = Files.createTempDirectory("graft_retain_test").toString
    (Lake(spark, LakeConfig(s"$dir/lake", dim = 5, numHashes = 4)), s"$dir/lake")
  }

  private def seed(lake: Lake, n: Int = 16): Unit = {
    val rng = new scala.util.Random(7)
    val rows = (0 until n).map { i =>
      (s"r$i", Seq.fill(5)(rng.nextGaussian().toFloat), s"doc $i")
    }.toDF("id", "vector", "document")
    lake.ingest(rows)
  }

  private def genDirs(root: String): Set[String] =
    new java.io.File(root).listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("gen-"))
      .map(_.getName).toSet

  /** Age every sidecar commit by `ms` (local-path test lake, so plain
    * java.io mtimes are the Hadoop-visible mtimes). */
  private def ageSidecars(root: String, ms: Long): Unit =
    new java.io.File(root).listFiles()
      .filter(f => f.isFile && f.getName.matches("_meta\\.\\d+\\.json"))
      .foreach(f => assert(f.setLastModified(f.lastModified() - ms)))

  test("a generation dead for less than the window survives vacuum, and a pre-maintenance reader keeps its files") {
    val (lake, root) = freshLake()
    seed(lake)
    val reader = lake.read() // resolves gen-1 file paths eagerly
    val before = reader.collect().map(_.getString(0)).sorted
    assert(lake.compact() > 0L) // gen-1 superseded, dead in place
    val swept = lake.vacuum(retainMs = 60L * 60L * 1000L)
    assert(swept === 0L, "nothing is old enough to sweep")
    assert(genDirs(root).contains("gen-1"), "young dead generation retained")
    // the in-flight reader's already-resolved plan still scans real files
    assert(reader.collect().map(_.getString(0)).sorted === before)
    assert(lake.count() === 16L)
  }

  test("death time comes from the superseding commit, not vacuum time: old dead generations are swept through the window") {
    val (lake, root) = freshLake()
    seed(lake)
    assert(lake.compact() > 0L)
    // make every commit (including the one that retired gen-1) 2h old
    ageSidecars(root, 2L * 60L * 60L * 1000L)
    assert(lake.vacuum(retainMs = 60L * 60L * 1000L) >= 1L)
    assert(!genDirs(root).contains("gen-1"), "long-dead generation swept")
    assert(lake.count() === 16L)
  }

  test("steady commits rotating out the death commit do not retain forever: the tombstone clock takes over") {
    val (lake, root) = freshLake()
    seed(lake)
    assert(lake.compact() > 0L) // gen-1 dies; its death commit is v2
    // enough further commits to rotate the death commit out of the
    // retained sidecar window — the steady-append regime in which the
    // retained commits' mtimes are perpetually recent
    (0 until 8).foreach { i =>
      lake.ingest(Seq((s"x$i", Seq(1f, 2f, 3f, 4f, 5f), s"late $i"))
        .toDF("id", "vector", "document"))
    }
    val hour = 60L * 60L * 1000L
    // first windowed vacuum: no retained commit knows gen-1's death ->
    // a tombstone is stamped and the generation retained
    assert(lake.vacuum(retainMs = hour) === 0L)
    assert(genDirs(root).contains("gen-1"))
    val ts = new java.io.File(root, "_dead.1")
    assert(ts.isFile, "tombstone stamped at first observation")
    // still inside the window on a repeat run: retained, clock unmoved
    assert(lake.vacuum(retainMs = hour) === 0L)
    assert(genDirs(root).contains("gen-1"))
    // age the tombstone past the window: swept, tombstone cleaned up
    assert(ts.setLastModified(ts.lastModified() - 2L * hour))
    assert(lake.vacuum(retainMs = hour) >= 1L)
    assert(!genDirs(root).contains("gen-1"), "tombstone-clocked sweep")
    assert(!ts.exists, "tombstone removed with its generation")
    assert(lake.count() === 24L)
  }

  test("readAt stays servable for retained snapshots and the default window remains sweep-now") {
    val (lake, root) = freshLake()
    seed(lake)
    val preCompact = lake.history().agg(org.apache.spark.sql.functions.max("version"))
      .head().getLong(0)
    lake.deleteWhere(org.apache.spark.sql.functions.col("document") === "doc 3")
    assert(lake.compact() > 0L)
    lake.vacuum(retainMs = 60L * 60L * 1000L)
    // the pre-delete snapshot's generation is retained → exact replay
    assert(lake.readAt(preCompact).count() === 16L)
    assert(lake.count() === 15L)
    // default retainMs = 0 keeps the historical sweep-now behavior
    assert(lake.vacuum() >= 1L)
    assert(genDirs(root).size === 1,
      "only the live generation remains after a sweep-now vacuum")
    intercept[IllegalStateException](lake.readAt(preCompact).count())
  }
}
