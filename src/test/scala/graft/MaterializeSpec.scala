package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Materialize

/** The shared lineage-cut helper: local mode (localCheckpoint) by
  * default, reliable parquet round-trip when a directory is given
  * explicitly or via the session conf — one deployment-time conf
  * upgrades every cut site in the engine. */
class MaterializeSpec extends SparkSpec {
  import spark.implicits._

  private def frame() = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")

  test("default mode: localCheckpoint semantics, rows unchanged, lineage cut") {
    val cut = Materialize.cut(frame())
    assert(cut.count() === 100L)
    assert(cut.orderBy("k").head().getLong(0) === 1L)
    // a cut frame's logical plan no longer contains the original project
    assert(cut.queryExecution.optimizedPlan.collectLeaves().nonEmpty)
    assert(!cut.queryExecution.logical.toString.contains("LocalRelation"),
      "lineage must be truncated, not re-derived")
  }

  test("explicit dir: cut round-trips through parquet at dir/cut-N") {
    val dir = Files.createTempDirectory("graft_mat").toString
    val cut = Materialize.cut(frame(), Some(dir))
    assert(cut.count() === 100L)
    val files = new java.io.File(dir).listFiles()
    assert(files != null && files.exists(_.getName.startsWith("cut-")),
      s"expected a cut-N step dir under $dir")
    // the returned frame READS the materialized copy: executor loss
    // cannot lose it (unlike localCheckpoint's executor-local blocks)
    assert(cut.queryExecution.logical.toString.contains("parquet"))
  }

  test("session conf upgrades every cut site without API churn") {
    val dir = Files.createTempDirectory("graft_mat_conf").toString
    spark.conf.set(Materialize.confKey, dir)
    try {
      val cut = Materialize.cut(frame())
      assert(cut.count() === 100L)
      assert(new java.io.File(dir).listFiles().exists(_.getName.startsWith("cut-")))
      assert(cut.queryExecution.logical.toString.contains("parquet"))
    } finally spark.conf.unset(Materialize.confKey)
    // conf cleared: back to localCheckpoint, no new files appear
    val before = new java.io.File(dir).listFiles().length
    Materialize.cut(frame()).count()
    assert(new java.io.File(dir).listFiles().length === before)
  }

  test("cutter numbers its own step sequence under the given prefix") {
    val dir = Files.createTempDirectory("graft_mat_steps").toString
    val cut = Materialize.cutter(Some(dir), "step")
    cut(frame()).count()
    cut(frame().where(col("k") <= 10)).count()
    val names = new java.io.File(dir).listFiles().map(_.getName).sorted.toSeq
    assert(names === Seq("step-0", "step-1"))
  }

  test("an explicit dir wins over the session conf") {
    val confDir = Files.createTempDirectory("graft_mat_conf2").toString
    val explicitDir = Files.createTempDirectory("graft_mat_exp").toString
    spark.conf.set(Materialize.confKey, confDir)
    try Materialize.cut(frame(), Some(explicitDir)).count()
    finally spark.conf.unset(Materialize.confKey)
    assert(new java.io.File(explicitDir).listFiles().nonEmpty)
    assert(new java.io.File(confDir).listFiles().isEmpty)
  }
}
