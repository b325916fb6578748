package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change feed over the generation layout: [[Lake.seal]] freezes the
  * live set into an immutable sync point (one sidecar commit, zero data
  * movement), and [[Lake.changesSince]]/[[Lake.changesBetween]] diff
  * the resolved file sets — files are immutable and never renamed, so
  * the diff is exact, and ONLY changed files are read (pinned below via
  * inputFiles). Netting cancels byte-identical rows across the two
  * sides, so row-level semantics come out right: appends → inserts,
  * DELETE WHERE → exactly the deleted rows, upsert → delete+insert per
  * replaced id, pure compact → zero. */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def mkLake(tag: String): Lake = {
    val dir = Files.createTempDirectory(s"graft_cf_$tag").toString
    Lake(spark, LakeConfig(s"$dir/lake", dim = 4, numHashes = 2))
  }

  private def rows(ids: Range): DataFrame =
    ids.map(i => (i.toString, Seq(i.toFloat, 1f, -i.toFloat, 0.5f), s"doc-$i"))
      .toDF("id", "vector", "document")

  private def ids(df: DataFrame, change: String): Seq[String] =
    df.where(col("change") === change).select("id").as[String]
      .collect().sorted.toSeq

  test("appends since a seal are exactly the insert delta") {
    val lake = mkLake("append")
    lake.ingest(rows(0 until 30))
    val v = lake.seal()
    lake.ingest(rows(100 until 120))
    for (netted <- Seq(true, false)) {
      val ch = lake.changesSince(v, netted)
      assert(ids(ch, "delete").isEmpty)
      assert(ids(ch, "insert") === (100 until 120).map(_.toString).sorted)
    }
  }

  test("deleteWhere: netted delta is exactly the deleted rows; raw shows rewrite churn") {
    val lake = mkLake("del")
    lake.ingest(rows(0 until 60))
    val v = lake.seal()
    assert(lake.deleteWhere(col("id").cast("long") % 3 === 0) === 20L)
    val ch = lake.changesSince(v)
    assert(ids(ch, "delete") ===
      (0 until 60).filter(_ % 3 == 0).map(_.toString).sorted)
    assert(ids(ch, "insert").isEmpty)
    // raw file-level mode reports the kept rows of rewritten dirs on
    // both sides (the netting is what cancels them)
    val raw = lake.changesSince(v, netted = false)
    assert(raw.where(col("change") === "insert").count() > 0L)
  }

  test("only changed files are read: a one-shard delete never opens other shards") {
    val lake = mkLake("pruned")
    lake.ingest(rows(0 until 60))
    val v = lake.seal()
    assert(lake.deleteIds(Seq("1")) === 1L)
    val routed = lake.lsh.shardOf(Seq(1.0, 1.0, -1.0, 0.5))
    val opened = lake.changesSince(v).inputFiles
    assert(opened.nonEmpty)
    assert(opened.forall(_.contains(s"shard=$routed")),
      s"read outside the rewritten shard: ${opened.mkString(", ")}")
  }

  test("upsert: replaced id is a delete+insert pair, fresh id an insert") {
    val lake = mkLake("upsert")
    lake.ingest(rows(0 until 40))
    val v = lake.seal()
    lake.upsert(Seq(
      ("7", Seq(-7f, -1f, 7f, -0.5f), "doc-7-v2"),
      ("9999", Seq(1f, 2f, 3f, 4f), "fresh")).toDF("id", "vector", "document"))
    val ch = lake.changesSince(v)
    assert(ch.where(col("change") === "delete")
      .select("id", "document").as[(String, String)].collect().toSeq ===
      Seq(("7", "doc-7")))
    assert(ids(ch, "insert") === Seq("7", "9999"))
  }

  test("a pure compact nets to zero; changesBetween two seals stays reproducible") {
    val lake = mkLake("compact")
    lake.ingest(rows(0 until 50))
    val v1 = lake.seal()
    lake.compact()
    val v2 = lake.seal()
    assert(lake.changesSince(v1).count() === 0L)
    assert(lake.changesSince(v1, netted = false).count() > 0L) // churn visible raw
    assert(lake.changesBetween(v1, v2).count() === 0L)
    lake.ingest(rows(200 until 210))
    // the between-seals delta is frozen even as the lake moves on
    assert(lake.changesBetween(v1, v2).count() === 0L)
    assert(ids(lake.changesSince(v2), "insert") ===
      (200 until 210).map(_.toString).sorted)
  }

  test("LakeChanges.net over the raw feed equals the in-source netted feed, rewrite churn included") {
    // the DSv2-native consumption shape (ADR: raw transport +
    // per-batch netting in foreachBatch) must be row-for-row identical
    // to netted=true — both delegate to the one netting definition.
    // The interval mixes appends, a deleteWhere (rewrite churn: kept
    // rows appear on both raw sides), and an upsert, so every
    // cancellation class is exercised.
    val lake = mkLake("nethelper")
    lake.ingest(rows(0 until 40))
    val v = lake.seal()
    lake.ingest(rows(100 until 110))
    assert(lake.deleteWhere(col("id").cast("long") % 5 === 0) > 0L)
    lake.upsert(rows(7 to 7))
    def canon(df: DataFrame): Seq[String] =
      df.select(col("id"), col("document"), col("change"),
          col("vector").cast("string"))
        .collect().map(_.toString).sorted.toSeq
    val viaHelper = graft.streaming.LakeChanges.net(
      lake.changesSince(v, netted = false))
    val inSource = lake.changesSince(v, netted = true)
    assert(canon(viaHelper) === canon(inSource))
    assert(viaHelper.columns.toSeq === inSource.columns.toSeq)
    // a frame without the change column refuses loudly
    val e = intercept[IllegalArgumentException](
      graft.streaming.LakeChanges.net(lake.read()))
    assert(e.getMessage.contains("change"))
  }

  test("seal leaves live rows unchanged; readAt(sealed) is frozen against later appends") {
    val lake = mkLake("frozen")
    lake.ingest(rows(0 until 25))
    val before = lake.read().select("id").as[String].collect().sorted
    val v = lake.seal()
    assert(lake.read().select("id").as[String].collect().sorted === before)
    assert(lake.topKExact(Seq(1.0, 1.0, -1.0, 0.5), 3).count() === 3L)
    lake.ingest(rows(500 until 505))
    assert(lake.readAt(v).select("id").as[String].collect().sorted === before)
    assert(lake.read().count() === 30L)
  }

  test("refusals: unsealed version, unknown version, vacuumed sync point") {
    val lake = mkLake("refuse")
    lake.ingest(rows(0 until 20))
    val unsealed = lake.currentVersion().get
    val e = intercept[IllegalArgumentException](lake.changesSince(unsealed))
    assert(e.getMessage.contains("seal()"))
    intercept[IllegalArgumentException](lake.changesSince(999L))
    val v = lake.seal()
    lake.compact() // v's directories become dead…
    lake.vacuum()  // …and the sweep retires them (retainMs = 0)
    val gone = intercept[IllegalStateException](lake.changesSince(v))
    assert(gone.getMessage.contains("vacuum"))
  }

  test("seal refuses a mismatched routing config; changesBetween refuses swapped versions") {
    val lake = mkLake("guard")
    lake.ingest(rows(0 until 10))
    val v1 = lake.seal()
    // a foreign-config session must not re-stamp the sidecar via seal:
    // its commit would carry the WRONG num_shards/seed, flipping which
    // session the routing check rejects
    val foreign = Lake(spark, LakeConfig(lake.cfg.location, dim = 4, numHashes = 3))
    intercept[IllegalArgumentException](foreign.seal())
    lake.ingest(rows(50 until 55))
    val v2 = lake.seal()
    val e = intercept[IllegalArgumentException](lake.changesBetween(v2, v1))
    assert(e.getMessage.contains("INVERTED"))
    assert(lake.changesBetween(v1, v2).count() === 5L)
  }

  test("sealed sidecars survive the inline version rotation") {
    val lake = mkLake("rotate")
    lake.ingest(rows(0 until 10))
    val v = lake.seal()
    (0 until 8).foreach(i =>
      lake.ingest(rows(100 + 10 * i until 100 + 10 * i + 5)))
    val sealedVersions = lake.history().where(col("sealed"))
      .select("version").as[Long].collect()
    assert(sealedVersions.contains(v))
    assert(lake.changesSince(v).where(col("change") === "insert").count() === 40L)
  }
}
