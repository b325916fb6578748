package graft

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.functions._

/** [[graft.Lake.expire]] — tiered TTL retention. Pins: the WHOLESALE
  * tier (zone-certified fully-old manifest directories retired by one
  * sidecar commit — zero rewrites, files left on disk for time
  * travel), the row-level tier for straddling/current-generation data,
  * the no-zone-map fallback (correct, just tier 2), the change feed
  * carrying retention as plain deletes to replicas, and the SQL
  * procedure face. */
class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_retention_spec").toString

  private def rows(from: Int, n: Int, ts: Option[Instant]) = {
    val base = (from until from + n).map { i =>
      (Seq(math.sin(i * 3).toFloat, math.cos(i * 7).toFloat,
        (i % 5 - 2).toFloat / 3, -math.sin(i).toFloat),
        s"doc-$i", s"id-$i")
    }.toDF("vector", "document", "id")
    ts.fold(base)(t => base.withColumn("timestamp",
      lit(java.sql.Timestamp.from(t))))
  }

  private val now = Instant.now()
  private val old = now.minusSeconds(10L * 86400)
  private val horizon = now.minusSeconds(5L * 86400)

  test("wholesale tier: zone-certified old directories retire by manifest commit — no rewrite, files stay for time travel") {
    val l = Lake(spark, LakeConfig(tmp() + "/lake", dim = 4, numHashes = 2))
    l.ingest(rows(0, 30, Some(old)))
    l.buildZoneMap()
    val sealV = l.seal() // old dirs become manifest entries
    l.ingest(rows(100, 10, None)) // fresh, current generation

    val genDirsBefore = l.filesView().select("file").as[String].collect().toSet
    val (retired, rewritten) = l.expire(horizon)
    assert(retired === 30L, "every old row retired by the manifest tier")
    assert(rewritten === 0L, "nothing needed the rewrite tier")
    assert(l.read().count() === 10L)
    assert(l.read().select("document").as[String].collect()
      .forall(_.stripPrefix("doc-").toInt >= 100))
    val audit = l.validate().head()
    assert(audit.getAs[Long]("misrouted") === 0L)
    // retired files are OUT of the live set but still ON DISK: the
    // pre-expire seal must stay time-travelable until vacuum
    val liveAfter = l.filesView().select("file").as[String].collect().toSet
    assert(liveAfter.intersect(genDirsBefore).size < genDirsBefore.size)
    assert(l.readAt(sealV).count() === 30L,
      "the sealed pre-expire snapshot still serves the retired rows")
    // a second expire is a no-op — nothing old remains
    assert(l.expire(horizon) === ((0L, 0L)))
  }

  test("row-level tier: straddling current-generation data deletes by rewrite; fresh rows survive") {
    val l = Lake(spark, LakeConfig(tmp() + "/lake", dim = 4, numHashes = 2))
    // old and fresh interleaved in the same (current) generation —
    // no manifest entries, nothing certifiable wholesale
    l.ingest(rows(0, 12, Some(old)))
    l.ingest(rows(100, 8, None))
    l.buildZoneMap()
    val (retired, rewritten) = l.expire(horizon)
    assert(retired === 0L)
    assert(rewritten === 12L)
    assert(l.read().count() === 8L)
  }

  test("no zone map: retention still correct, everything rides the rewrite tier") {
    val l = Lake(spark, LakeConfig(tmp() + "/lake", dim = 4, numHashes = 2))
    l.ingest(rows(0, 9, Some(old)))
    l.seal()
    l.ingest(rows(100, 6, None))
    val (retired, rewritten) = l.expire(horizon)
    assert(retired === 0L, "no map, no certificates — no wholesale tier")
    assert(rewritten === 9L)
    assert(l.read().count() === 6L)
  }

  test("retention rides the change feed: a synced replica applies both tiers as plain deletes") {
    val base = tmp()
    val src = Lake(spark, LakeConfig(base + "/src", dim = 4, numHashes = 2))
    src.ingest(rows(0, 20, Some(old)))
    src.buildZoneMap()
    src.seal()
    src.ingest(rows(100, 5, None))
    val a = src.seal()
    val replica = src.cloneTo(base + "/rep", asOf = Some(a))
    val (retired, rewritten) = src.expire(horizon)
    assert(retired === 20L && rewritten === 0L)
    val b = src.seal()
    val (deleted, inserted) = replica.syncFrom(src, a, b)
    assert(deleted === 20L && inserted === 0L,
      "wholesale retirement reaches the replica as netted deletes")
    assert(replica.read().count() === 5L)
  }

  test("maintain(ttlMs) folds retention into the policy loop; off by default") {
    val l = Lake(spark, LakeConfig(tmp() + "/lake", dim = 4, numHashes = 2))
    l.ingest(rows(0, 15, Some(old)))
    l.buildZoneMap()
    l.seal()
    l.ingest(rows(100, 5, None))
    // default: no ttl — nothing expires
    assert(l.maintain().expiredRows === 0L)
    assert(l.read().count() === 20L)
    // ttl on: the old rows go (wholesale here — sealed + zone-mapped),
    // and the rest of the policy loop still runs on the survivor set
    val r = l.maintain(ttlMs = 5L * 86400 * 1000)
    assert(r.expiredRows === 15L)
    assert(l.read().count() === 5L)
    // converged: the next ttl'd maintain expires nothing
    assert(l.maintain(ttlMs = 5L * 86400 * 1000).expiredRows === 0L)
  }

  test("the SQL face: CALL expire(table, retain_ms)") {
    val w = Files.createTempDirectory("graft_retention_wh").toString
    spark.conf.set("spark.sql.catalog.rlakes",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rlakes.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rlakes.default")
    spark.sql("""CREATE TABLE rlakes.default.ttl (vector array<float>, document string)
                 USING graft OPTIONS (dim '4', numHashes '2')""")
    val oldTs = java.sql.Timestamp.from(old)
    spark.sql(s"""INSERT INTO rlakes.default.ttl (vector, document, timestamp)
                  VALUES (array(1.0F, 0.0F, 0.0F, 0.0F), 'stale-a', TIMESTAMP '$oldTs'),
                         (array(0.0F, 1.0F, 0.0F, 0.0F), 'stale-b', TIMESTAMP '$oldTs')""")
    spark.sql("""INSERT INTO rlakes.default.ttl (vector, document)
                 VALUES (array(0.0F, 0.0F, 1.0F, 0.0F), 'fresh')""")
    val r = spark.sql(
      s"""CALL rlakes.system.expire(table => 'default.ttl',
            retain_ms => ${5L * 86400 * 1000})""").head()
    assert(r.getLong(0) + r.getLong(1) === 2L, s"expired 2 rows, got $r")
    assert(spark.sql("SELECT document FROM rlakes.default.ttl")
      .as[String].collect().toSeq === Seq("fresh"))
    val bad = intercept[Exception](spark.sql(
      "CALL rlakes.system.expire(table => 'default.ttl', retain_ms => -1)"))
    assert(bad.getMessage.contains(">= 0"), bad.getMessage)
    // the policy loop's SQL face carries the same knob + report column
    val m = spark.sql(
      s"""CALL rlakes.system.maintain(table => 'default.ttl',
            ttl_ms => ${5L * 86400 * 1000})""").head()
    assert(m.getAs[Long]("expired_rows") === 0L,
      "already-expired lake: ttl'd maintain expires nothing more")
  }
}
