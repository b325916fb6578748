package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** CO-LOCATED DERIVED TABLES ([[Lake.deriveTo]] / [[Lake.joinDerived]] /
  * [[DerivedTable]]): per-row feature tables sharded identically to
  * their base lake, refreshed incrementally off the change feed, and
  * joined back as a storage-partitioned join with zero exchange. Every
  * plan pin also pins row equality against a recomputed truth — the
  * plan may never buy its shape with wrong rows. */
class DerivedSpec extends SparkSpec {
  import spark.implicits._

  private def rows(ids: Range) =
    ids.map { i =>
      (s"r-$i", Seq(math.sin(i * 3).toFloat, math.cos(i * 7).toFloat,
        (i % 5 - 2).toFloat / 3), s"doc $i word" * (1 + i % 3))
    }.toDF("id", "vector", "document")

  private def freshLake(tag: String, hashes: Int = 3): Lake = {
    val dir = Files.createTempDirectory(s"graft_derived_$tag").toString
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 3, numHashes = hashes))
    lake.delete()
    lake
  }

  private def feat(df: DataFrame): DataFrame =
    df.select(col("id"), col("shard"),
      length(col("document")).as("doc_len"),
      round(graft.functions.VectorFunctions.l2Norm(col("vector")), 6)
        .as("norm"))

  /** Expected feature-join rows recomputed straight from the lake. */
  private def truth(lake: Lake): Seq[(String, Int, Int, Double)] =
    lake.read()
      .select(col("id"), col("shard"), length(col("document")).as("doc_len"),
        round(graft.functions.VectorFunctions.l2Norm(col("vector")), 6)
          .as("norm"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
      .sortBy(_._1).toSeq

  private def joined(lake: Lake, d: DerivedTable,
      spj: Boolean = true): DataFrame =
    lake.joinDerived(d, spj = spj)
      .select(col("id"), col("shard"), col("doc_len"), col("norm"))

  private def collected(df: DataFrame): Seq[(String, Int, Int, Double)] =
    df.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
      .sortBy(_._1).toSeq

  test("full build + co-located join serves exactly the recomputed features") {
    val lake = freshLake("build")
    lake.ingest(rows(0 until 120))
    val dloc = lake.cfg.location + "_feat"
    val d = lake.deriveTo(dloc)(feat)
    assert(d.baseLocation.endsWith("/lake"))
    assert(d.numShards === 8)
    assert(!d.isStale(lake))
    assert(collected(joined(lake, d)) === truth(lake))
    // and through the stock shuffled plan too — same rows
    assert(collected(joined(lake, d, spj = false)) === truth(lake))
  }

  test("the derived location reads through the format: pinned schema, shard-pruned") {
    val lake = freshLake("fmt")
    lake.ingest(rows(0 until 60))
    val dloc = lake.cfg.location + "_feat"
    val d = lake.deriveTo(dloc)(feat)
    val df = spark.read.format("graft").load(dloc)
    assert(df.schema.fieldNames.toSeq === Seq("id", "doc_len", "norm", "shard"))
    assert(df.count() === lake.read().count())
    // partition pruning on the derived shard column
    val some = d.read().select("shard").distinct().head().getInt(0)
    val pruned = df.where(col("shard") === some)
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .collect { case b: BatchScanExec => b }
      .flatMap(_.inputRDD.partitions.length :: Nil).sum
    assert(pruned.count() === d.read().where(col("shard") === some).count())
    assert(scanned <= 1, s"shard-pruned derived scan planned $scanned partitions")
  }

  test("staleness: a base commit after derive refuses the join; allowStale serves the snapshot; refresh clears it") {
    val lake = freshLake("stale")
    lake.ingest(rows(0 until 40))
    val dloc = lake.cfg.location + "_feat"
    val d = lake.deriveTo(dloc)(feat)
    lake.ingest(rows(40 until 60))
    assert(d.isStale(lake))
    val e = intercept[IllegalArgumentException](lake.joinDerived(d))
    assert(e.getMessage.contains("STALE"))
    // the stale snapshot still serves ITS rows (inner join covers the
    // derive-time corpus only)
    assert(lake.joinDerived(d, allowStale = true).count() === 40L)
    val d2 = lake.deriveTo(dloc)(feat)
    assert(!d2.isStale(lake))
    assert(collected(joined(lake, d2)) === truth(lake))
  }

  test("a deleted-and-recreated base never passes freshness: the anchor sync point must still be listed") {
    val lake = freshLake("recreate")
    lake.ingest(rows(0 until 20))
    val dloc = lake.cfg.location + "_feat"
    val d = lake.deriveTo(dloc)(feat)
    lake.delete()
    lake.ingest(rows(0 until 10)) // version counter restarted below d's sync point
    assert(d.isStale(lake),
      "a recreated base passed the freshness guard vacuously")
    val e = intercept[IllegalArgumentException](lake.joinDerived(d))
    assert(e.getMessage.contains("STALE"))
  }

  test("incremental refresh is O(churn): appends, deletes, and an upsert land; untouched shard directories stay byte-in-place") {
    val lake = freshLake("incr")
    lake.ingest(rows(0 until 100))
    val dloc = lake.cfg.location + "_feat"
    val d1 = lake.deriveTo(dloc)(feat)
    val liveBefore = d1.state.live.toSet

    // churn: new rows, a delete, and an upsert replacing a document
    lake.ingest(rows(100 until 130))
    lake.deleteWhere(col("id").endsWith("7"))
    val up = lake.read().where(col("id") === "r-4")
      .select(col("vector"), lit("rewritten doc").as("document"), col("id"))
    lake.upsert(up)

    val d2 = lake.deriveTo(dloc)(feat)
    assert(collected(joined(lake, d2)) === truth(lake))
    // the rewrite touched ONLY shards the churn named: every kept live
    // entry is the IDENTICAL directory (same gen path), not a rewrite
    val changedShards = d2.state.live.toSet.diff(liveBefore)
      .map(DerivedTable.shardOf)
    val keptDirs = d2.state.live.toSet.intersect(liveBefore)
    assert(keptDirs.nonEmpty, "refresh rewrote every shard — not O(churn)")
    keptDirs.foreach(rel => assert(!changedShards.contains(DerivedTable.shardOf(rel))))
    // an upsert's replaced feature row carries the NEW document length
    val r4 = joined(lake, d2).where(col("id") === "r-4").head()
    assert(r4.getInt(2) === "rewritten doc".length)
  }

  test("no-churn refresh commits only a new sync point (no new generation)") {
    val lake = freshLake("nochurn")
    lake.ingest(rows(0 until 30))
    val dloc = lake.cfg.location + "_feat"
    val d1 = lake.deriveTo(dloc)(feat)
    val d2 = lake.deriveTo(dloc)(feat) // nothing changed between seals
    assert(d2.state.generation === d1.state.generation)
    assert(d2.state.live === d1.state.live)
    assert(d2.baseVersion > d1.baseVersion)
    assert(collected(joined(lake, d2)) === truth(lake))
  }

  test("zero-exchange: the co-located join plans with no shuffle on either side") {
    val lake = freshLake("spj")
    lake.ingest(rows(0 until 400))
    val dloc = lake.cfg.location + "_feat"
    val d = lake.deriveTo(dloc)(feat)
    val confs = Seq(
      "spark.sql.files.maxPartitionBytes" -> "16384",
      "spark.sql.files.openCostInBytes" -> "16384",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      // join keys (shard, id) ⊃ partition keys (shard): co-partition
      // acceptance needs the relaxed (Iceberg-documented) mode — the
      // strict default demands EVERY join key be a partition key
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false")
    val prev = confs.map { case (k, _) =>
      k -> (try Some(spark.conf.get(k)) catch { case _: Exception => None })
    }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val q = joined(lake, d)
      assert(collected(q) === truth(lake))
      val plan = q.queryExecution.executedPlan
      val shuffles = exchangesOf(plan)
      assert(shuffles.isEmpty,
        s"co-located derived join planned ${shuffles.size} exchange(s):\n$plan")
      // the stock run (spj = false) DOES shuffle — the A/B that proves
      // the zero-exchange shape is the SPJ, not a toy-plan accident
      val stock = joined(lake, d, spj = false)
      assert(exchangesOf(stock.queryExecution.executedPlan).nonEmpty)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def exchangesOf(p: SparkPlan): Seq[ShuffleExchangeExec] =
    p.collect {
      case s: ShuffleExchangeExec => Seq(s)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        exchangesOf(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        exchangesOf(q.plan)
    }.flatten

  test("joinDerivedAll: two feature tables chain with zero exchange; staleness of EITHER refuses") {
    val lake = freshLake("multi")
    lake.ingest(rows(0 until 300))
    val d1 = lake.deriveTo(lake.cfg.location + "_f1")(feat)
    val d2 = lake.deriveTo(lake.cfg.location + "_f2")(df =>
      df.select(col("id"), col("shard"),
        substring(col("document"), 1, 3).as("prefix")))
    // d2's derive SEALED the base after d1's sync point — a pure seal
    // moves no rows, so d1 stays jointly fresh (rowSetUnchangedSince);
    // a strict latest-version check would make sibling feature tables
    // permanently un-joinable
    assert(!d1.isStale(lake) && !d2.isStale(lake))
    val out = lake.joinDerivedAll(Seq(d1, d2))
      .select(col("id"), col("doc_len"), col("prefix"))
    val got = out.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).sortBy(_._1)
    val want = lake.read().select("id", "document").collect()
      .map(r => (r.getString(0), r.getString(1).length,
        r.getString(1).take(3))).sortBy(_._1)
    assert(got.toSeq === want.toSeq)
    // chained zero-exchange under the SPJ opt-in
    val confs = Seq(
      "spark.sql.files.maxPartitionBytes" -> "16384",
      "spark.sql.files.openCostInBytes" -> "16384",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false")
    val prev = confs.map { case (k, _) =>
      k -> (try Some(spark.conf.get(k)) catch { case _: Exception => None })
    }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val chained = lake.joinDerivedAll(Seq(d1, d2))
        .select(col("id"), col("doc_len"), col("prefix"))
      assert(chained.count() === want.size.toLong)
      val ex = exchangesOf(chained.queryExecution.executedPlan)
      assert(ex.isEmpty, s"chained derived join planned ${ex.size} exchange(s)")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    // a ROW-CHANGING commit stales BOTH tables
    lake.ingest(rows(300 until 310))
    assert(d1.isStale(lake) && d2.isStale(lake))
    val e = intercept[IllegalArgumentException](
      lake.joinDerivedAll(Seq(d1, d2)))
    assert(e.getMessage.contains("STALE"))
  }

  test("transform contract: dropped id refused; out-of-range shard refused per row; schema drift on refresh refused with the rebuild recovery") {
    val lake = freshLake("contract")
    lake.ingest(rows(0 until 20))
    val dloc = lake.cfg.location + "_feat"
    val e1 = intercept[IllegalArgumentException](
      lake.deriveTo(dloc + "1")(df => df.select(col("shard"), col("document"))))
    assert(e1.getMessage.contains("must pass 'id'"))
    val e2 = intercept[Exception](
      lake.deriveTo(dloc + "2")(df =>
        df.select(col("id"), (col("shard") + 100).as("shard"))))
    assert(e2.getMessage.contains("outside [0, 8)") ||
      Option(e2.getCause).exists(_.getMessage.contains("outside [0, 8)")))
    // schema drift on an incremental refresh: refused, rebuild heals
    val d = lake.deriveTo(dloc)(feat)
    lake.ingest(rows(20 until 30))
    val wider = (df: DataFrame) => feat(df).withColumn("extra", lit(1))
    val e3 = intercept[IllegalArgumentException](lake.deriveTo(dloc)(wider))
    assert(e3.getMessage.contains("rebuild"))
    val d2 = lake.deriveTo(dloc, rebuild = true)(wider)
    assert(d2.schema.fieldNames.contains("extra"))
    assert(lake.joinDerived(d2).count() === lake.read().count())
    assert(d.baseVersion < d2.baseVersion)
  }

  test("a resharded base refuses incremental refresh AND the join; rebuild re-co-locates at the new width") {
    val lake = freshLake("reshard", hashes = 2)
    lake.ingest(rows(0 until 80))
    val dloc = lake.cfg.location + "_feat"
    val d = lake.deriveTo(dloc)(feat)
    val wide = lake.reshard(4)
    val e1 = intercept[IllegalArgumentException](wide.joinDerived(d))
    assert(e1.getMessage.contains("resharded"))
    val e2 = intercept[IllegalArgumentException](wide.deriveTo(dloc)(feat))
    assert(e2.getMessage.contains("resharded"))
    val d2 = wide.deriveTo(dloc, rebuild = true)(feat)
    assert(d2.numShards === 16)
    assert(collected(joined(wide, d2)) === truth(wide))
  }

  test("self/overlap guard compares QUALIFIED paths: slash, scheme, and nested spellings of the lake all refuse (no Overwrite reaches the lake tree)") {
    val lake = freshLake("overlap")
    lake.ingest(rows(0 until 25))
    val before = lake.read().count()
    Seq(
      lake.cfg.location + "/",
      "file:" + lake.cfg.location,
      lake.cfg.location + "/nested/feat"
    ).foreach { spelled =>
      val e = intercept[IllegalArgumentException](lake.deriveTo(spelled)(feat))
      assert(e.getMessage.contains("must not be, or overlap"), spelled)
    }
    // ...and a lake INSIDE the derived target refuses too
    val parent = lake.cfg.location.stripSuffix("/lake")
    val e = intercept[IllegalArgumentException](lake.deriveTo(parent)(feat))
    assert(e.getMessage.contains("must not be, or overlap"))
    assert(lake.read().count() === before, "a refused derive touched data")
  }

  test("vacuum reclaims superseded generations and old sidecars; the live snapshot keeps serving") {
    val lake = freshLake("vacuum")
    lake.ingest(rows(0 until 50))
    val dloc = lake.cfg.location + "_feat"
    lake.deriveTo(dloc)(feat)
    lake.ingest(rows(50 until 70))
    lake.deriveTo(dloc)(feat) // refresh: gen-2 + kept gen-1 dirs
    val d3 = lake.deriveTo(dloc, rebuild = true)(feat) // orphans gens 1-2
    val (trees, sidecars) = d3.vacuum(keepVersions = 1)
    assert(trees >= 1, "rebuild left no dead generation tree?")
    assert(sidecars >= 1)
    assert(collected(joined(lake, d3)) === truth(lake))
    // only live generations remain on disk
    val fs = DerivedTable.fsOf(spark, dloc)
    val liveGens = d3.state.live.map(_.split("/").head).toSet +
      s"gen-${d3.state.generation}"
    val onDisk = fs.listStatus(new org.apache.hadoop.fs.Path(dloc)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen-"))
      .map(_.getPath.getName).toSet
    assert(onDisk.subsetOf(liveGens), s"dead trees survived: ${onDisk -- liveGens}")
  }

  test("refusals: user-keyed lake; deriving onto the lake itself; loading a non-derived location") {
    val dir = Files.createTempDirectory("graft_derived_refuse").toString
    val user = Lake(spark, LakeConfig(s"$dir/user", dim = 3,
      partitionKey = Some("tenant")))
    user.ingest(Seq((Seq(1f, 0f, 0f), "a")).toDF("vector", "tenant"))
    val e1 = intercept[IllegalArgumentException](
      user.deriveTo(s"$dir/feat")(identity))
    assert(e1.getMessage.contains("user-keyed"))
    val lake = freshLake("refuse")
    lake.ingest(rows(0 until 5))
    val e2 = intercept[IllegalArgumentException](
      lake.deriveTo(lake.cfg.location)(identity))
    assert(e2.getMessage.contains("must not be, or overlap"))
    val e3 = intercept[IllegalArgumentException](
      DerivedTable.load(spark, lake.cfg.location))
    assert(e3.getMessage.contains("no derived-table sidecar"))
    // and a foreign base refuses the join
    val other = freshLake("refuse2")
    other.ingest(rows(0 until 5))
    val d = lake.deriveTo(lake.cfg.location + "_feat")(feat)
    val e4 = intercept[IllegalArgumentException](other.joinDerived(d))
    assert(e4.getMessage.contains("was built from"))
  }

  test("a torn newest sidecar (crash between create and write) falls back to the previous commit; the next derive heals over it") {
    val lake = freshLake("torn")
    lake.ingest(rows(0 until 30))
    val dloc = lake.cfg.location + "_feat"
    val d1 = lake.deriveTo(dloc)(feat)
    // what a crash mid-commit leaves: an empty newest version file
    val fs = DerivedTable.fsOf(spark, dloc)
    val torn = new org.apache.hadoop.fs.Path(dloc,
      s"_derived.${99}.json")
    fs.create(torn, false).close()
    val loaded = DerivedTable.load(spark, dloc)
    assert(loaded.baseVersion === d1.baseVersion,
      "torn newest sidecar did not fall back to the intact commit")
    assert(collected(joined(lake, loaded)) === truth(lake))
    // the next derive allocates PAST the torn version — heals over it
    lake.ingest(rows(30 until 40))
    val d2 = lake.deriveTo(dloc)(feat)
    assert(collected(joined(lake, d2)) === truth(lake))
    // vacuum tolerates the torn debris INSIDE its keep window: it is
    // retired like any dead version, reclamation stays available
    val (_, sidecarsGone) = d2.vacuum(keepVersions = 3)
    assert(sidecarsGone >= 1, "vacuum did not retire the torn sidecar")
    assert(!fs.exists(torn))
    assert(collected(joined(lake, DerivedTable.load(spark, dloc)))
      === truth(lake))
    // all-torn still fails loudly
    val dloc2 = lake.cfg.location + "_feat2"
    fs.mkdirs(new org.apache.hadoop.fs.Path(dloc2))
    fs.create(new org.apache.hadoop.fs.Path(dloc2, "_derived.1.json"),
      false).close()
    val e = intercept[IllegalStateException](DerivedTable.load(spark, dloc2))
    assert(e.getMessage.contains("no parseable sidecar"))
  }

  test("a crashed prior attempt's stranded staging tree does not block the retry (converges over it)") {
    val lake = freshLake("crash")
    lake.ingest(rows(0 until 60))
    val dloc = lake.cfg.location + "_feat"
    lake.deriveTo(dloc)(feat)
    // what a crash between writeDerivedGen and the sidecar commit
    // leaves behind: an UNCOMMITTED next-generation tree
    Seq(("junk", 99, 9, 9.9)).toDF("id", "shard", "doc_len", "norm")
      .write.parquet(s"$dloc/gen-2/stranded")
    lake.ingest(rows(60 until 80))
    val d2 = lake.deriveTo(dloc)(feat) // refresh stages gen-2 again
    assert(d2.state.generation === 2L)
    assert(collected(joined(lake, d2)) === truth(lake))
  }

  test("SQL face: a derived table registers in the catalog read-only (adopt by LOCATION; writes, column lists, and managed mode refuse; DROP keeps the tree)") {
    val lake = freshLake("sqlface")
    lake.ingest(rows(0 until 30))
    val dloc = lake.cfg.location + "_feat"
    val d = lake.deriveTo(dloc)(feat)
    val wh = Files.createTempDirectory("graft_derived_cat").toString
    spark.conf.set("spark.sql.catalog.dcat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.dcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dcat.default")
    spark.sql(
      s"CREATE TABLE dcat.default.feats USING graft LOCATION '$dloc'")
    val got = spark.sql(
      "SELECT id, doc_len, norm, shard FROM dcat.default.feats ORDER BY id")
    assert(got.count() === 30L)
    // read-only: the derived table advertises BATCH_READ only
    val e1 = intercept[Exception](spark.sql(
      "INSERT INTO dcat.default.feats VALUES ('x', 1, 1.0, 0)"))
    assert(e1.getMessage.toLowerCase.contains("does not support") ||
      e1.getMessage.toLowerCase.contains("append"))
    // a column list is a second schema authority — refused
    spark.sql("DROP TABLE IF EXISTS dcat.default.feats2")
    val e2 = intercept[IllegalArgumentException](spark.sql(
      s"CREATE TABLE dcat.default.feats2 (id string) USING graft LOCATION '$dloc'"))
    assert(e2.getMessage.contains("without a column list"))
    // time travel / ALTER refuse BY NAME (not a misleading lake-config
    // error): a derived table has no version history of its own
    val e4 = intercept[Exception](spark.sql(
      "SELECT * FROM dcat.default.feats VERSION AS OF 1").collect())
    assert(e4.getMessage.contains("derived feature table"), e4.getMessage)
    val e5 = intercept[Exception](spark.sql(
      "ALTER TABLE dcat.default.feats ADD COLUMNS (extra int)"))
    assert(e5.getMessage.contains("derived feature table"), e5.getMessage)
    // DROP unregisters; the derived tree survives (external semantics)
    spark.sql("DROP TABLE dcat.default.feats")
    assert(DerivedTable.load(spark, dloc).baseVersion === d.baseVersion)
    assert(lake.joinDerived(d).count() === 30L)
  }

  test("reshardTo re-keys after a base reshard without recompute: surviving features keep their ORIGINAL values, only churn runs the transform") {
    val lake = freshLake("rekey", hashes = 2)
    lake.ingest(rows(0 until 80))
    val dloc = lake.cfg.location + "_feat"
    val d = lake.deriveTo(dloc)(feat)
    // churn BEFORE the reshard: inserts, a delete, an upsert
    lake.ingest(rows(80 until 100))
    lake.deleteWhere(col("id") === "r-5")
    lake.upsert(Seq(("r-6", Seq(0.5f, 0.5f, 0.5f), "replaced r-6 doc"))
      .toDF("id", "vector", "document"))
    val wide = lake.reshard(4)
    // churn AFTER the reshard too — the delta spans all of it
    wide.ingest(rows(100 until 110))
    val e = intercept[IllegalArgumentException](wide.joinDerived(d))
    assert(e.getMessage.contains("reshardTo"), e.getMessage)
    // a DIFFERENT (schema-compatible) transform proves which rows ran
    // it: re-keyed survivors must keep the ORIGINAL doc_len, churn
    // rows get the +1000 variant — f never re-ran over the corpus
    def featAlt(df: DataFrame): DataFrame =
      df.select(col("id"), col("shard"),
        (length(col("document")) + 1000).as("doc_len"),
        round(graft.functions.VectorFunctions.l2Norm(col("vector")), 6)
          .as("norm"))
    val d2 = d.reshardTo(wide)(featAlt)
    assert(d2.numShards === 16)
    assert(!d2.isStale(wide))
    val got = wide.joinDerived(d2)
      .select("id", "doc_len").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val docs = wide.read().select(col("id"), length(col("document")))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got.keySet === docs.keySet, "re-key lost or invented rows")
    val untouched = (0 until 80).map(i => s"r-$i").toSet - "r-5" - "r-6"
    got.foreach { case (id, len) =>
      if (untouched.contains(id))
        assert(len === docs(id), s"$id: transform re-ran over an unchanged row")
      else
        assert(len === docs(id) + 1000, s"$id: churn row missed the transform")
    }
    // shard values are the base's — the co-located join still plans
    // zero exchanges
    val spjPlan = wide.joinDerived(d2).queryExecution.executedPlan
    assert(spjPlan.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
    }.isEmpty, "re-keyed derived join lost the zero-exchange shape")
    // ...and the NEXT refresh is a plain O(churn) incremental, diffing
    // from after the reshard
    wide.ingest(rows(110 until 115))
    val d3 = wide.deriveTo(dloc)(featAlt)
    assert(wide.joinDerived(d3).count() === wide.read().count())
  }

  test("format options asOf/view refuse on a derived location (never silently serve the latest snapshot)") {
    val lake = freshLake("asofopt")
    lake.ingest(rows(0 until 20))
    val dloc = lake.cfg.location + "_feat"
    lake.deriveTo(dloc)(feat)
    lake.ingest(rows(20 until 30))
    lake.deriveTo(dloc)(feat) // two snapshots — the silent bug served THIS one
    val e1 = intercept[Exception](
      spark.read.format("graft").option("asOf", "1").load(dloc).collect())
    assert(e1.getMessage.contains("derived feature table"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.read.format("graft").option("view", "history").load(dloc).collect())
    assert(e2.getMessage.contains("derived feature table"), e2.getMessage)
    // plain reads are untouched
    assert(spark.read.format("graft").load(dloc).count() === 30L)
  }

  test("a no-churn refresh still refuses a transform whose output schema drifted") {
    val lake = freshLake("nochurn")
    lake.ingest(rows(0 until 20))
    val dloc = lake.cfg.location + "_feat"
    val d = lake.deriveTo(dloc)(feat)
    // zero row churn since the sync point, but f now yields a WIDER
    // schema — before the fix this committed a new sync point silently
    val e = intercept[IllegalArgumentException](
      lake.deriveTo(dloc)(df => feat(df).withColumn("extra", lit(1))))
    assert(e.getMessage.contains("output schema changed"), e.getMessage)
    // the recorded snapshot is untouched and still serves...
    val still = DerivedTable.load(spark, dloc)
    assert(still.state.generation === d.state.generation)
    assert(collected(joined(lake, still)) === truth(lake))
    // ...and the unchanged transform's no-churn refresh stays a cheap
    // sync-point advance (same generation, no rewrite)
    val d2 = lake.deriveTo(dloc)(feat)
    assert(d2.state.generation === d.state.generation)
  }

  test("vacuum never reclaims a racing deriveTo's young staging tree or its just-created sidecar; aged crash debris still retires") {
    val lake = freshLake("vacguard")
    lake.ingest(rows(0 until 30))
    val dloc = lake.cfg.location + "_feat"
    val d = lake.deriveTo(dloc)(feat) // gen-1, version 1
    // a concurrent deriveTo mid-commit: staged gen-2 tree on disk,
    // sidecar created but not yet written (both look dead/torn to a
    // sidecar-anchored liveness judgment)
    Seq(("inflight", 0, 1, 1.0)).toDF("id", "shard", "doc_len", "norm")
      .write.parquet(s"$dloc/gen-2/shard=0")
    val fs = DerivedTable.fsOf(spark, dloc)
    val young = new org.apache.hadoop.fs.Path(dloc, "_derived.2.json")
    fs.create(young, false).close()
    val (trees, sidecars) = d.vacuum(keepVersions = 1)
    assert(trees === 0, "vacuum deleted an in-flight staging tree")
    assert(sidecars === 0, "vacuum retired a possibly-in-flight newest sidecar")
    assert(fs.exists(young))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dloc/gen-2")))
    // aged past the grace window it is crash debris, not a racer —
    // the torn sidecar retires and the orphan staging tree reclaims
    val (trees2, sidecars2) = d.vacuum(keepVersions = 1, graceMs = 0L)
    assert(trees2 === 1)
    assert(sidecars2 === 1)
    assert(!fs.exists(young))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dloc/gen-2")))
    assert(collected(joined(lake, DerivedTable.load(spark, dloc)))
      === truth(lake))
  }

  test("a location holding BOTH sidecars resolves as a lake everywhere: reads, DDL adoption, and time travel agree") {
    val lake = freshLake("bothsc")
    lake.ingest(rows(0 until 15))
    val loc = lake.cfg.location
    // corruption: a stray _derived sidecar lands inside a lake tree.
    // rootSidecar resolves lake-over-derived for reads; the catalog
    // must agree on every path or DDL and reads describe two tables
    val other = freshLake("bothsc2")
    other.ingest(rows(0 until 5))
    val dloc = other.cfg.location + "_feat"
    val dstate = other.deriveTo(dloc)(feat).state
    val fs = DerivedTable.fsOf(spark, loc)
    val stray = new org.apache.hadoop.fs.Path(loc, "_derived.1.json")
    val out = fs.create(stray, false)
    out.write(DerivedTable.render(dstate)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    // the format serves the LAKE
    assert(spark.read.format("graft").load(loc).count() === 15L)
    val wh = Files.createTempDirectory("graft_both_cat").toString
    spark.conf.set("spark.sql.catalog.bcat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.bcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bcat.default")
    // adoption goes down the LAKE path (the derived path would demand
    // LOCATION-only registration with a different message)
    spark.sql(s"CREATE TABLE bcat.default.both USING graft LOCATION '$loc'")
    assert(spark.sql("SELECT * FROM bcat.default.both").count() === 15L)
    // time travel works as the lake, not refused as derived
    val v = lake.history().agg(max(col("version"))).head().getLong(0)
    assert(spark.sql(
      s"SELECT * FROM bcat.default.both VERSION AS OF $v").count() === 15L)
    spark.sql("DROP TABLE bcat.default.both")
  }

  test("left join serves feature-less base rows with null features (a filtering transform)") {
    val lake = freshLake("left")
    lake.ingest(rows(0 until 40))
    val dloc = lake.cfg.location + "_feat"
    // features only for even ids — a curation-style partial projection
    val d = lake.deriveTo(dloc)(df =>
      feat(df).where(col("doc_len") % 2 === 0))
    val out = lake.joinDerived(d, how = "left")
    assert(out.count() === 40L)
    val expectMissing = lake.read().where(length(col("document")) % 2 =!= 0).count()
    assert(out.where(col("doc_len").isNull).count() === expectMissing)
    // inner join = exactly the featured subset
    assert(lake.joinDerived(d).count() === 40L - expectMissing)
  }
}
