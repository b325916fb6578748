package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** SQL row-level DML ([[graft.sources.GraftRowLevelBuilder]]):
  * UPDATE, MERGE INTO, and subquery DELETE against a graft table.
  * Pins: untouched columns ride the staging codec byte-exactly
  * (floats, metadata maps, timestamps), shard-moving SET vector
  * re-routes, the full MERGE mix lands the modeled end state,
  * subquery DELETE works where filter pushdown can't, the staging
  * dir is swept, duplicate written ids refuse, and a no-match DML
  * is a clean no-op. */
class GraftDmlSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft_dml_wh").toString
    spark.conf.set("spark.sql.catalog.dml",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.dml.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dml.default")
    w
  }

  private def sql(s: String) = spark.sql(s)

  private def freshTable(name: String): Lake = {
    warehouse
    sql(s"DROP TABLE IF EXISTS dml.default.$name")
    sql(s"""CREATE TABLE dml.default.$name (vector array<float>, document string)
            USING graft OPTIONS (dim '4', numHashes '2')""")
    Lake(spark, LakeConfig(s"$warehouse/default/$name", dim = 4, numHashes = 2))
  }

  test("UPDATE: untouched columns round-trip the staging codec byte-exactly; WHERE prunes; no-match is a no-op") {
    val lake = freshTable("up")
    // explicit timestamps + metadata so the codec has something to lose
    lake.ingest(Seq(
      (Seq(1f, 0f, 0f, 0f), "a", "id-a", Map("k" -> "v1", "j" -> "x")),
      (Seq(0f, 1f, 0f, 0f), "b", "id-b", Map("k" -> "v2")),
      (Seq(0f, 0.3f, 0.7f, -0.1f), "c", "id-c", Map.empty[String, String]))
      .toDF("vector", "document", "id", "metadata")
      .withColumn("timestamp",
        to_timestamp(lit("2026-02-03 04:05:06.123456"))))
    val before = lake.read()
      .select("id", "vector", "metadata", "timestamp", "shard")
      .collect().map(r => r.getString(0) -> r).toMap

    sql("UPDATE dml.default.up SET document = 'A!' WHERE document = 'a'")

    val after = lake.read()
      .select("id", "vector", "metadata", "timestamp", "shard", "document")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(after.keySet === before.keySet, "UPDATE must not add or drop rows")
    assert(after("id-a").getString(5) === "A!")
    assert(after("id-b").getString(5) === "b" && after("id-c").getString(5) === "c")
    for (id <- before.keys) {
      assert(after(id).getAs[scala.collection.Seq[Float]](1) ===
        before(id).getAs[scala.collection.Seq[Float]](1), s"$id vector")
      assert(after(id).getAs[Map[String, String]](2) ===
        before(id).getAs[Map[String, String]](2), s"$id metadata")
      assert(after(id).getTimestamp(3) === before(id).getTimestamp(3),
        s"$id timestamp")
      assert(after(id).getInt(4) === before(id).getInt(4), s"$id shard")
    }
    // no-match UPDATE: clean no-op, same live state
    val files = lake.read().inputFiles.toSet
    sql("UPDATE dml.default.up SET document = 'zzz' WHERE document = 'nope'")
    assert(lake.read().inputFiles.toSet === files,
      "a no-match UPDATE must rewrite nothing")
    // staging swept
    val fs = new org.apache.hadoop.fs.Path(lake.cfg.location)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(lake.cfg.location, "_rlo")),
      "the _rlo staging dir must be swept after commit")
  }

  test("UPDATE SET vector re-routes the row; validate stays clean") {
    val lake = freshTable("mv")
    sql("""INSERT INTO dml.default.mv (vector, document)
           VALUES (array(1.0F, 0.0F, 0.0F, 0.0F), 'stay'),
                  (array(0.0F, 1.0F, 0.0F, 0.0F), 'move')""")
    val shardBefore = lake.read().where(col("document") === "move")
      .select("shard").as[Int].head()
    sql("""UPDATE dml.default.mv SET vector = array(-0.0F, -1.0F, -0.0F, -0.0F)
           WHERE document = 'move'""")
    val moved = lake.read().where(col("document") === "move").collect()
    assert(moved.length === 1)
    assert(moved.head.getAs[Int]("shard") !== shardBefore,
      "a negated vector must route to the complementary shard")
    assert(lake.read().count() === 2)
    assert(lake.validate().head().getAs[Long]("misrouted") === 0L,
      "the moved row must live in its routed directory")
  }

  test("MERGE INTO: matched update, matched delete, not-matched insert, not-matched-by-source delete") {
    val lake = freshTable("mg")
    sql("""INSERT INTO dml.default.mg (vector, document)
           VALUES (array(1.0F, 0.0F, 0.0F, 0.0F), 'keep-update'),
                  (array(0.0F, 1.0F, 0.0F, 0.0F), 'kill'),
                  (array(0.0F, 0.0F, 1.0F, 0.0F), 'orphan')""")
    Seq(("keep-update", Seq(0.5f, 0.5f, 0f, 0f), "updated"),
      ("kill", Seq(0f, 0f, 0f, 1f), "ignored"),
      ("brand-new", Seq(0.1f, 0.2f, 0.3f, 0.4f), "inserted"))
      .toDF("key", "vec", "doc").createOrReplaceTempView("mg_src")

    sql("""MERGE INTO dml.default.mg t
           USING mg_src s ON t.document = s.key
           WHEN MATCHED AND s.doc = 'ignored' THEN DELETE
           WHEN MATCHED THEN UPDATE SET document = s.doc, vector = s.vec
           WHEN NOT MATCHED THEN INSERT (vector, document) VALUES (s.vec, s.doc)
           WHEN NOT MATCHED BY SOURCE THEN DELETE""")

    val got = lake.read().select("document", "vector").collect()
      .map(r => r.getString(0) ->
        r.getAs[scala.collection.Seq[Float]](1).toSeq).toMap
    assert(got === Map(
      "updated" -> Seq(0.5f, 0.5f, 0f, 0f),
      "inserted" -> Seq(0.1f, 0.2f, 0.3f, 0.4f)),
      s"MERGE end state diverged: $got")
    // inserts took the full derive path: id, timestamp, metadata, shard
    val fresh = lake.read().where(col("document") === "inserted").head()
    assert(fresh.getAs[String]("id") != null &&
      fresh.getAs[java.sql.Timestamp]("timestamp") != null &&
      fresh.getAs[Map[String, String]]("metadata").nonEmpty)
    assert(lake.validate().head().getAs[Long]("misrouted") === 0L)
  }

  test("subquery DELETE goes through the row-level path where filter pushdown cannot") {
    val lake = freshTable("sq")
    sql("""INSERT INTO dml.default.sq (vector, document)
           VALUES (array(1.0F, 0.0F, 0.0F, 0.0F), 'd1'),
                  (array(0.0F, 1.0F, 0.0F, 0.0F), 'd2'),
                  (array(0.0F, 0.0F, 1.0F, 0.0F), 'd3')""")
    Seq("d1", "d3").toDF("doomed").createOrReplaceTempView("sq_kill")
    sql("""DELETE FROM dml.default.sq
           WHERE document IN (SELECT doomed FROM sq_kill)""")
    assert(lake.read().select("document").as[String].collect().toSeq ===
      Seq("d2"))
  }

  test("duplicate written ids refuse loudly; the failed DML leaves the lake untouched") {
    val lake = freshTable("dup")
    sql("""INSERT INTO dml.default.dup (vector, document)
           VALUES (array(1.0F, 0.0F, 0.0F, 0.0F), 'n1'),
                  (array(0.0F, 1.0F, 0.0F, 0.0F), 'n2')""")
    Seq("n1", "n2").toDF("key").createOrReplaceTempView("dup_src")
    val before = lake.read().collect()
      .map(r => (r.getAs[String]("id"), r.getAs[String]("document"))).toSet
    // two matched rows re-keyed onto ONE id: no row order exists to
    // pick a winner — the apply must refuse, not corrupt identity
    val e = intercept[Exception](
      sql("""MERGE INTO dml.default.dup t USING dup_src s ON t.document = s.key
             WHEN MATCHED THEN UPDATE SET id = 'same-id'"""))
    def mentions(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("duplicate ids")) ||
        mentions(t.getCause))
    assert(mentions(e), e.toString)
    assert(lake.read().collect()
      .map(r => (r.getAs[String]("id"), r.getAs[String]("document"))).toSet
      === before, "a refused DML must leave the live state untouched")
    // an INSERT-ONLY merge, by contrast, is append-planned by Spark
    // (no row-level op): duplicate ids land like INSERT INTO would and
    // are validate()'s dup_ids to report — pin that boundary
    Seq(("n3", Seq(0f, 0f, 1f, 0f))).toDF("key", "vec")
      .createOrReplaceTempView("dup_ins")
    sql("""MERGE INTO dml.default.dup t USING dup_ins s ON t.document = s.key
           WHEN NOT MATCHED THEN
             INSERT (vector, document) VALUES (s.vec, s.key)""")
    assert(lake.read().count() === 3)
  }

  test("evolved extras ride the DML codec: UPDATE sets them, untouched rows keep theirs") {
    val lake = freshTable("ev")
    sql("ALTER TABLE dml.default.ev ADD COLUMNS (score double, tags array<string>)")
    sql("""INSERT INTO dml.default.ev (vector, document, score, tags)
           VALUES (array(1.0F, 0.0F, 0.0F, 0.0F), 'a', 0.25D, array('x', 'y')),
                  (array(0.0F, 1.0F, 0.0F, 0.0F), 'b', 0.5D, array('z'))""")
    sql("""UPDATE dml.default.ev SET score = score * 2, tags = array('bumped')
           WHERE document = 'a'""")
    val got = lake.read().select("document", "score", "tags").collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getAs[scala.collection.Seq[String]](2).toSeq)))
      .toMap
    assert(got === Map("a" -> ((0.5, Seq("bumped"))),
      "b" -> ((0.5, Seq("z")))))
  }

  test("a packSignBits lake recomputes packed on SET vector; hamming search follows") {
    warehouse
    val dir = Files.createTempDirectory("graft_dml_packed").toString
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 4, numHashes = 2,
      packSignBits = true))
    lake.ingest(Seq((Seq(1f, 1f, 1f, 1f), "pos", "id-p"),
      (Seq(-1f, -1f, -1f, -1f), "neg", "id-n"))
      .toDF("vector", "document", "id"))
    sql(s"DROP TABLE IF EXISTS dml.default.pk")
    sql(s"CREATE TABLE dml.default.pk USING graft LOCATION '$dir/lake'")
    sql("""UPDATE dml.default.pk SET vector = array(-1.0F, -1.0F, -1.0F, -1.0F)
           WHERE document = 'pos'""")
    val rows = lake.read().select("document", "packed").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("pos") === rows("neg"),
      "the flipped vector must repack to the negative sign pattern")
    assert(lake.validate().head().getAs[Long]("misrouted") === 0L)
  }

  test("two racing DML statements: single-writer contract — loser refuses loudly, retry converges, no corruption") {
    val lake = freshTable("race")
    sql("""INSERT INTO dml.default.race (vector, document)
           VALUES (array(1.0F, 0.0F, 0.0F, 0.0F), 'a'),
                  (array(0.0F, 1.0F, 0.0F, 0.0F), 'b')""")
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    def upd(doc: String): java.util.concurrent.Future[Option[Throwable]] =
      pool.submit(() => {
        gate.await(10, TimeUnit.SECONDS)
        try { sql(s"UPDATE dml.default.race SET document = '$doc!' " +
          s"WHERE document = '$doc'"); None }
        catch { case t: Throwable => Some(t) }
      })
    val (fa, fb) = (upd("a"), upd("b"))
    gate.countDown()
    val fails = Seq(fa, fb).flatMap(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    // the writer lock serializes applies; a loser (if any) must be the
    // documented loud refusal, never a silent partial apply
    fails.foreach { t =>
      def cme(x: Throwable): Boolean = x != null &&
        (x.isInstanceOf[java.util.ConcurrentModificationException] ||
          cme(x.getCause))
      assert(cme(t), s"unexpected failure kind: $t")
    }
    assert(fails.size < 2, "both writers lost the race — livelock")
    // retry whatever lost: the end state must carry BOTH updates
    Seq("a", "b").foreach { d =>
      if (lake.read().where(col("document") === s"$d!").isEmpty)
        sql(s"UPDATE dml.default.race SET document = '$d!' " +
          s"WHERE document = '$d'")
    }
    assert(lake.read().select("document").as[String].collect().sorted.toSeq
      === Seq("a!", "b!"))
    assert(lake.validate().head().getAs[Long]("misrouted") === 0L)
    // no stranded staging after the race + retries
    val fs = new org.apache.hadoop.fs.Path(lake.cfg.location)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(lake.cfg.location, "_rlo")))
  }

  test("opt-in lock retry: racing DML statements converge without caller retries under spark.graft.dml.lockRetries") {
    val lake = freshTable("race_retry")
    sql("""INSERT INTO dml.default.race_retry (vector, document)
           VALUES (array(1.0F, 0.0F, 0.0F, 0.0F), 'a'),
                  (array(0.0F, 1.0F, 0.0F, 0.0F), 'b')""")
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    spark.conf.set("spark.graft.dml.lockRetries", "8")
    spark.conf.set("spark.graft.dml.lockRetryWaitMs", "100")
    try {
      val pool = Executors.newFixedThreadPool(2)
      val gate = new CountDownLatch(1)
      def upd(doc: String): java.util.concurrent.Future[Option[Throwable]] =
        pool.submit(() => {
          gate.await(10, TimeUnit.SECONDS)
          try { sql(s"UPDATE dml.default.race_retry SET document = '$doc!' " +
            s"WHERE document = '$doc'"); None }
          catch { case t: Throwable => Some(t) }
        })
      val (fa, fb) = (upd("a"), upd("b"))
      gate.countDown()
      val fails = Seq(fa, fb).flatMap(_.get(120, TimeUnit.SECONDS))
      pool.shutdown()
      // with retries on, the loser backs off and re-applies its staged
      // delta itself: no statement fails, both updates land
      assert(fails.isEmpty, s"retry mode must converge, got: $fails")
      assert(lake.read().select("document").as[String].collect().sorted.toSeq
        === Seq("a!", "b!"))
      assert(lake.validate().head().getAs[Long]("misrouted") === 0L)
      // the staging sweep still ran for every attempt
      val fs = new org.apache.hadoop.fs.Path(lake.cfg.location)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(lake.cfg.location, "_rlo")))
    } finally {
      spark.conf.unset("spark.graft.dml.lockRetries")
      spark.conf.unset("spark.graft.dml.lockRetryWaitMs")
    }
  }

  test("_graft_rid is a hidden metadata column: absent from SELECT *, explicitly selectable, always non-null") {
    val lake = freshTable("rid")
    sql("""INSERT INTO dml.default.rid (vector, document)
           VALUES (array(1.0F, 0.0F, 0.0F, 0.0F), 'a'),
                  (array(0.0F, 1.0F, 0.0F, 0.0F), 'b')""")
    // hidden by default — a user's SELECT * schema is untouched
    assert(!sql("SELECT * FROM dml.default.rid").columns
      .contains("_graft_rid"))
    // explicitly selectable, equal to id, and DECLARED non-null (the
    // property the row-level rowId rides on)
    val df = sql("SELECT id, _graft_rid FROM dml.default.rid")
    assert(!df.schema("_graft_rid").nullable,
      "the metadata twin must declare non-null")
    assert(df.collect().forall(r => r.getString(0) == r.getString(1)))
    // a lake can never grow a shadowing DATA column
    val e = intercept[Exception](
      sql("ALTER TABLE dml.default.rid ADD COLUMNS (_graft_rid string)"))
    assert(e.getMessage.contains("reserved"))
  }

  test("a stranded _rlo staging dir is vacuum-swept past the age gate; a fresh one survives") {
    val lake = freshTable("rlo")
    sql("""INSERT INTO dml.default.rlo (vector, document)
           VALUES (array(1.0F, 0.0F, 0.0F, 0.0F), 'a')""")
    val fs = new org.apache.hadoop.fs.Path(lake.cfg.location)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mk(name: String, ageMs: Long): org.apache.hadoop.fs.Path = {
      val d = new org.apache.hadoop.fs.Path(lake.cfg.location, s"_rlo/$name")
      fs.mkdirs(d)
      fs.create(new org.apache.hadoop.fs.Path(d, "delta-0-0.jsonl"), true)
        .close()
      fs.setTimes(d, System.currentTimeMillis() - ageMs, -1)
      d
    }
    val stale = mk("crashed-query", 3600000L) // an hour dead
    val fresh = mk("live-query", 0L)
    lake.vacuum()
    assert(!fs.exists(stale), "the hour-dead staging dir must sweep")
    assert(fs.exists(fresh),
      "a fresh staging dir is a LIVE statement's — age-protected")
    fs.delete(new org.apache.hadoop.fs.Path(lake.cfg.location, "_rlo"), true)
  }

  test("an UPDATE's matched-row scan PRUNES: shard partition filter + parquet pushdown reach the DML plan") {
    val lake = freshTable("pl")
    import spark.implicits._
    val rows = (0 until 200).map { i =>
      (Seq(math.sin(i * 3).toFloat, math.cos(i * 7).toFloat,
        (i % 5 - 2).toFloat / 3, -math.sin(i).toFloat), s"doc-$i")
    }
    rows.toDF("vec", "doc").createOrReplaceTempView("pl_seed")
    sql("""INSERT INTO dml.default.pl (vector, document)
           SELECT vec, doc FROM pl_seed""")
    val shards = sql("SELECT DISTINCT shard FROM dml.default.pl")
      .as[Int].collect()
    assert(shards.length > 2, "fixture must spread across shards")
    val victim = lake.read().where(col("shard") === shards.head)
      .select("document").as[String].head()
    // the DML command's executed plan carries the WriteDelta subtree —
    // assert the scan under it pruned to ONE shard directory and pushed
    // the residual predicate into parquet
    val df = sql(s"""UPDATE dml.default.pl SET document = 'pruned!'
      WHERE shard = ${shards.head} AND document = '$victim'""")
    // CommandResultExec carries the executed command plan as a FIELD,
    // not a child — unwrap before collecting scans
    val inner = df.queryExecution.executedPlan match {
      case c: org.apache.spark.sql.execution.CommandResultExec =>
        c.commandPhysicalPlan
      case p => p
    }
    val scans = inner.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty, df.queryExecution.executedPlan.toString.take(1000))
    val desc = scans.map(_.toString).mkString("\n")
    assert(desc.contains(s"(shard#") && desc.contains(s"= ${shards.head})"),
      s"no shard partition filter in the DML scan:\n${desc.take(1500)}")
    assert(desc.contains("PushedFilters: [IsNotNull(document), EqualTo(document,"),
      s"document predicate not pushed to parquet:\n${desc.take(1500)}")
    assert(lake.read().where(col("document") === "pruned!").count() === 1)
  }

  test("user-keyed lakes: UPDATE moves a row when SET changes the partition key") {
    warehouse
    val dir = Files.createTempDirectory("graft_dml_keyed").toString
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 4,
      partitionKey = Some("tenant")))
    lake.ingest(Seq(
      (Seq(1f, 0f, 0f, 0f), "a", "acme"),
      (Seq(0f, 1f, 0f, 0f), "b", "globex"))
      .toDF("vector", "document", "tenant"))
    sql("DROP TABLE IF EXISTS dml.default.keyed")
    sql(s"CREATE TABLE dml.default.keyed USING graft LOCATION '$dir/lake'")
    // SET on the PARTITION KEY: the row must physically move partitions
    sql("""UPDATE dml.default.keyed SET tenant = 'initech'
           WHERE document = 'a'""")
    val got = lake.read().select("document", "tenant").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map("a" -> "initech", "b" -> "globex"))
    // physical placement: the LIVE file set now has an initech
    // directory and no acme one — the row moved partitions on disk,
    // it did not just change a column under a stale directory
    val live = lake.read().inputFiles
    assert(live.exists(_.contains("tenant=initech")),
      s"no initech directory in the live set: ${live.mkString(", ")}")
    assert(!live.exists(_.contains("tenant=acme")),
      s"the old acme directory is still live: ${live.mkString(", ")}")
    assert(lake.read().where(col("tenant") === "initech")
      .select("document").as[String].collect().toSeq === Seq("a"))
    assert(lake.read().where(col("tenant") === "acme").isEmpty,
      "the old partition must not retain the moved row")
  }

  test("MERGE into a fresh EMPTY table bootstraps: not-matched inserts land derived; a second MERGE matches them") {
    val lake = freshTable("boot")
    Seq(("a", Seq(1f, 0f, 0f, 0f)), ("b", Seq(0f, 1f, 0f, 0f)))
      .toDF("key", "vec").createOrReplaceTempView("boot_src")
    // with BOTH clauses the statement rides the delta path (insert-only
    // merges are append-planned) — the empty-lake apply must bootstrap,
    // not refuse
    sql("""MERGE INTO dml.default.boot t USING boot_src s ON t.document = s.key
           WHEN MATCHED THEN UPDATE SET vector = s.vec
           WHEN NOT MATCHED THEN INSERT (vector, document) VALUES (s.vec, s.key)""")
    val rows = lake.read().collect()
    assert(rows.length === 2)
    assert(rows.forall(r => r.getAs[String]("id") != null &&
      r.getAs[java.sql.Timestamp]("timestamp") != null), "derive must run")
    assert(lake.validate().head().getAs[Long]("misrouted") === 0L)
    // the bootstrapped rows are real upsert targets for the next MERGE
    sql("""MERGE INTO dml.default.boot t USING boot_src s ON t.document = s.key
           WHEN MATCHED THEN UPDATE SET document = concat(s.key, '2')""")
    assert(lake.read().select("document").as[String].collect().sorted
      .toSeq === Seq("a2", "b2"))
  }

  test("SQL DML rides the change feed: a replica syncs an UPDATE as a netted delete+insert pair") {
    val lake = freshTable("feed")
    sql("""INSERT INTO dml.default.feed (vector, document)
           VALUES (array(1.0F, 0.0F, 0.0F, 0.0F), 'a'),
                  (array(0.0F, 1.0F, 0.0F, 0.0F), 'b')""")
    val a = lake.seal()
    val dir = Files.createTempDirectory("graft_dml_feed").toString
    val replica = lake.cloneTo(s"$dir/rep")

    sql("UPDATE dml.default.feed SET document = 'a2' WHERE document = 'a'")
    val b = lake.seal()

    // the DML rewrite nets to exactly one delete + one insert — the
    // untouched row's rewritten-but-identical copy cancels out
    val delta = lake.changesBetween(a, b)
      .select("change", "document").collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(delta === Seq(("delete", "a"), ("insert", "a2")),
      s"unexpected netted delta: $delta")

    // and the replica converges by applying it
    val (d, i) = replica.syncFrom(lake, a, b)
    assert(d === 1L && i === 1L)
    assert(replica.read().select("document").as[String].collect().sorted
      .toSeq === Seq("a2", "b"))
    assert(replica.diffStats(lake).where(!col("in_sync")).isEmpty,
      "post-sync audit must read clean")
  }

  test("DML parity with the Scala API: MERGE update ≡ upsert, row for row") {
    val lake = freshTable("par")
    val rows = (0 until 30).map { i =>
      (Seq(math.sin(i * 3).toFloat, math.cos(i * 7).toFloat,
        (i % 5 - 2).toFloat / 3, -math.sin(i).toFloat), s"doc-$i", s"id-$i")
    }
    rows.toDF("vector", "document", "id").createOrReplaceTempView("par_seed")
    sql("""INSERT INTO dml.default.par (vector, document, id)
           SELECT vector, document, id FROM par_seed""")
    // twin lake mutated through the Scala API
    val twin = Lake(spark, LakeConfig(
      Files.createTempDirectory("graft_dml_twin").toString + "/l",
      dim = 4, numHashes = 2))
    twin.ingest(rows.toDF("vector", "document", "id"))
    val upd = Seq(("id-3", Seq(9f, 0f, 0f, 0f), "v2-3"),
      ("id-7", Seq(0f, 9f, 0f, 0f), "v2-7"))
    twin.upsert(upd.toDF("id", "vector", "document"))
    upd.toDF("id", "vec", "doc").createOrReplaceTempView("par_upd")
    sql("""MERGE INTO dml.default.par t USING par_upd s ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET vector = s.vec, document = s.doc""")
    def profile(l: Lake): Set[(String, Seq[Float], String, Int)] =
      l.read().select("id", "vector", "document", "shard").collect()
        .map(r => (r.getString(0),
          r.getAs[scala.collection.Seq[Float]](1).toSeq,
          r.getString(2), r.getInt(3))).toSet
    assert(profile(lake) === profile(twin),
      "MERGE and upsert must land identical rows, routing included")
  }
}
