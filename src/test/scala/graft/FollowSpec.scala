package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** [[graft.Lake.follow]] — continuous replication: a replica lake
  * tracks its source through the raw DSv2 `graft-changes` stream +
  * per-batch netting + [[graft.Lake.applyChanges]] in foreachBatch.
  * Pins: empty-replica bootstrap then live convergence through the
  * full mutation mix, checkpointed restart resuming at O(churn), the
  * cloned-replica convergence pass REWRITING NOTHING (file set
  * untouched), and the config-mismatch refusal. */
class FollowSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_follow_spec").toString

  private def rows(from: Int, n: Int) = (from until from + n).map { i =>
    (Seq(math.sin(i * 3).toFloat, math.cos(i * 7).toFloat,
      (i % 5 - 2).toFloat / 3, -math.sin(i).toFloat),
      s"doc-$i", s"id-$i")
  }.toDF("vector", "document", "id")

  /** Retry a source mutation that collides with the follow stream's
    * per-trigger seal: the stream takes the SOURCE's writer lock for
    * each sync point, so a concurrent writer legitimately sees the
    * documented ConcurrentModificationException and retries — exactly
    * the operator posture the error message prescribes. Without this,
    * the test races the stream's polling cadence (the faster the read
    * path gets, the more often the stream seals, the wider the
    * collision window — it started flaking when round 11's pinned
    * reads sped polling up). */
  private def retrying[T](body: => T): T = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case e: java.util.ConcurrentModificationException =>
          if (attempt >= 20) throw e
          Thread.sleep(150); attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def fingerprint(l: Lake): Set[String] = {
    val df = l.read()
    val cols = df.schema.fields.sortBy(_.name).map { f =>
      f.dataType match {
        case _: org.apache.spark.sql.types.MapType =>
          array_sort(map_entries(col(f.name))).cast("string")
        case _ => col(f.name).cast("string")
      }
    }
    df.select(concat_ws("|", cols.toIndexedSeq: _*)).as[String].collect().toSet
  }

  test("a replica follows its source live: bootstrap, mutation mix, restart at O(churn)") {
    val base = tmp()
    val src = Lake(spark, LakeConfig(base + "/src", dim = 4, numHashes = 2))
    src.ingest(rows(0, 30))
    val replica = Lake(spark, LakeConfig(base + "/rep", dim = 4, numHashes = 2))
    val cp = base + "/cp"

    val q = replica.follow(src.cfg, cp)
    try {
      q.processAllAvailable()
      assert(fingerprint(replica) === fingerprint(src),
        "bootstrap snapshot landed the full source state")

      // live mutation mix: delete, shard-moving replacement, insert —
      // each retried on collision with the stream's own sync-point
      // seals (see [[retrying]])
      retrying(src.deleteWhere(col("document").isin("doc-1", "doc-2")))
      retrying(src.upsert(src.read().where(col("document") === "doc-4")
        .select(transform(col("vector"), v => -v).as("vector"),
          col("document"), col("id"))))
      retrying(src.ingest(rows(100, 3)))
      q.processAllAvailable()
      assert(fingerprint(replica) === fingerprint(src),
        "the follower converged on the mutated source")
      assert(replica.validate().head().getAs[Long]("misrouted") === 0L)
    } finally q.stop()

    // offline churn, then restart from the checkpoint: the follower
    // resumes at the delta — no snapshot replay (the snapshot batch is
    // committed in the checkpoint), and the end state converges
    src.deleteWhere(col("document") === "doc-7")
    src.ingest(rows(200, 2))
    val q2 = replica.follow(src.cfg, cp)
    try {
      q2.processAllAvailable()
      assert(fingerprint(replica) === fingerprint(src),
        "restart resumed from the checkpoint and converged")
    } finally q2.stop()
  }

  test("a cloned replica's convergence pass rewrites nothing: the file set is untouched") {
    val base = tmp()
    val src = Lake(spark, LakeConfig(base + "/src", dim = 4, numHashes = 2))
    src.ingest(rows(0, 40))
    val a = src.seal()
    val replica = src.cloneTo(base + "/rep", asOf = Some(a))

    val filesBefore = replica.filesView().select("file").as[String].collect().toSet
    assert(filesBefore.nonEmpty)

    // fresh checkpoint → batch 0 replays the FULL snapshot as inserts;
    // convergence netting must prove the clone identical and skip the
    // rewrite — every data file stays byte-in-place
    val q = replica.follow(src.cfg, base + "/cp")
    try q.processAllAvailable() finally q.stop()

    val filesAfter = replica.filesView().select("file").as[String].collect().toSet
    assert(filesAfter === filesBefore,
      "an already-converged replica must not rewrite any partition")
    assert(fingerprint(replica) === fingerprint(src))
  }

  test("refusal: config-mismatched follower (routing would corrupt silently)") {
    val base = tmp()
    val src = Lake(spark, LakeConfig(base + "/src", dim = 4, numHashes = 2))
    src.ingest(rows(0, 5))
    val replica = Lake(spark, LakeConfig(base + "/rep", dim = 4, numHashes = 3))
    val e = intercept[IllegalArgumentException](
      replica.follow(src.cfg, base + "/cp"))
    assert(e.getMessage.contains("routing/storage config"))
    val self = intercept[IllegalArgumentException](
      src.follow(src.cfg, base + "/cp2"))
    assert(self.getMessage.contains("cannot follow itself"))
  }
}
