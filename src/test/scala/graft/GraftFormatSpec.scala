package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** The `graft` batch DSv2 format: `spark.read.format("graft")` and
  * `CREATE TABLE ... USING graft` land on the same generation-aware
  * live set as `Lake.read()`, with partition pruning and parquet
  * pushdown working THROUGH the format, `asOf` time travel, and
  * writes refused. */
class GraftFormatSpec extends SparkSpec {
  import spark.implicits._

  private def rows(n: Int, tag: String) =
    (0 until n).map { i =>
      (s"$tag-$i", Seq(math.sin(i * 3 + tag.length).toFloat,
        math.cos(i * 7).toFloat, (i % 5 - 2).toFloat / 3), s"doc $tag $i")
    }.toDF("id", "vector", "document")

  private def freshLake(): Lake = {
    val dir = Files.createTempDirectory("graft_fmt").toString
    Lake(spark, LakeConfig(s"$dir/lake", dim = 3, numHashes = 2))
  }

  private def ids(df: DataFrame): Set[String] =
    df.select("id").collect().map(_.getString(0)).toSet

  private def fmt(lake: Lake): DataFrame =
    spark.read.format("graft").load(lake.cfg.location)

  private def scanExecs(df: DataFrame): Seq[BatchScanExec] = {
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[BatchScanExec] =
      p.collect {
        case b: BatchScanExec => Seq(b)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        // AQE materializes stages as QueryStageExec whose plan is a
        // FIELD, not a child — collect() alone never reaches the scans
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
      }.flatten
    walk(df.queryExecution.executedPlan)
  }

  test("format reads the SAME live set as Lake.read across churn: appends, deleteWhere, compact") {
    val lake = freshLake()
    lake.ingest(rows(40, "a"))
    assert(ids(fmt(lake)) === ids(lake.read()))
    // a second generation: row-level delete rewrites affected shards
    assert(lake.deleteWhere(col("id") === "a-3") === 1L)
    assert(ids(fmt(lake)) === ids(lake.read()))
    assert(!ids(fmt(lake)).contains("a-3"),
      "the format must not read retired files of rewritten shards")
    // post-rewrite append lands in the current generation
    lake.ingest(rows(10, "bb"))
    assert(ids(fmt(lake)) === ids(lake.read()))
    // compact collapses to one fresh generation; dead gens must not be read
    lake.compact()
    assert(ids(fmt(lake)) === ids(lake.read()))
    assert(fmt(lake).count() === 49L)
    // schema: stored columns + shard partition column
    val cols = fmt(lake).columns.toSet
    assert(Set("id", "vector", "document", "timestamp", "shard").subsetOf(cols), cols)
  }

  test("partition pruning and parquet pushdown work THROUGH the format") {
    val lake = freshLake()
    lake.ingest(rows(60, "p"))
    val df = fmt(lake)
    val shards = df.select("shard").distinct().as[Int].collect().sorted
    assert(shards.length > 1, "fixture must spread over multiple shards")
    val one = df.where(col("shard") === shards.head)
    assert(ids(one) === ids(lake.read().where(col("shard") === shards.head)))
    // partition pruning: the scan's file slice is the one directory
    val scans = scanExecs(one)
    assert(scans.nonEmpty, one.queryExecution.executedPlan.toString.take(1500))
    val files = scans.map(_.scan).map {
        // unwrap the runtime-filtering wrapper to the delegated scan
        case g: graft.sources.GraftRuntimeScan => g.underlying
        case f => f
      }.flatMap {
        case f: org.apache.spark.sql.execution.datasources.v2.FileScan =>
          f.fileIndex.listFiles(f.partitionFilters, f.dataFilters)
            .flatMap(_.files).map(_.getPath.toString)
      }
    assert(files.nonEmpty && files.forall(_.contains(s"shard=${shards.head}")),
      s"expected only shard=${shards.head} files, got: $files")
    // data filter pushdown reaches the parquet scan
    val plan = df.where(col("document") === "doc p 7")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("doc p 7"),
      plan.take(1500))
    // column pruning: a 2-column projection reads 2 columns
    val proj = df.select("id", "shard").queryExecution.executedPlan.toString
    assert(!proj.contains("vector"), proj.take(1500))
  }

  test("pure-SQL routed kNN: lsh_shard over a literal query constant-folds and prunes the format scan") {
    val lake = freshLake() // dim 3, numHashes 2, seed 42
    lake.ingest(rows(60, "s"))
    graft.functions.GraftFunctions.register(spark)
    val view = "fmt_knn_" + java.lang.Integer.toHexString(
      System.identityHashCode(this))
    fmt(lake).createOrReplaceTempView(view)
    val q = Seq(0.9, 0.1, -0.2)
    val qSql = q.mkString("array(", "D, ", "D)")
    // the whole SQL a Scala-free user writes: route + rank + limit
    val sql = s"""
      SELECT id, round(1.0 - vector_dot($qSql, CAST(vector AS ARRAY<DOUBLE>))
        / (sqrt(vector_dot($qSql, $qSql)) *
           sqrt(vector_dot(CAST(vector AS ARRAY<DOUBLE>),
                           CAST(vector AS ARRAY<DOUBLE>)))), 6) AS dist
      FROM $view
      WHERE shard = lsh_shard($qSql, 3, 2, 42)
      ORDER BY dist, id LIMIT 5"""
    val df = spark.sql(sql)
    val got = df.collect().map(_.getString(0)).toSeq
    // same answers as the Scala routed topK
    val want = lake.topK(q, 5).select("id").collect().map(_.getString(0)).toSeq
    assert(got === want)
    // and the scan was PRUNED: lsh_shard folded to a literal, so only
    // the routed shard's directory is in the file slice
    val routed = lake.lsh.shardOf(q)
    val files = scanExecs(df).map(_.scan).map {
        case g: graft.sources.GraftRuntimeScan => g.underlying
        case f => f
      }.flatMap {
      case f: org.apache.spark.sql.execution.datasources.v2.FileScan =>
        f.fileIndex.listFiles(f.partitionFilters, f.dataFilters)
          .flatMap(_.files).map(_.getPath.toString)
    }
    assert(files.nonEmpty && files.forall(_.contains(s"shard=$routed")),
      s"expected only shard=$routed files, got: $files")
  }

  test("asOf reads a past snapshot; a vacuumed version fails loudly") {
    val lake = freshLake()
    lake.ingest(rows(20, "v"))
    val v1 = lake.seal()
    lake.ingest(rows(5, "w"))
    val v2 = lake.seal()
    def at(v: Long) = spark.read.format("graft")
      .option("asOf", v).load(lake.cfg.location)
    assert(ids(at(v1)) === ids(lake.readAt(v1)))
    assert(ids(at(v1)).size === 20)
    assert(ids(at(v2)).size === 25)
    assert(ids(fmt(lake)) === ids(at(v2)))
    val e = intercept[IllegalArgumentException](at(99999L).collect())
    assert(e.getMessage.contains("no sidecar version"))
  }

  test("SQL surface: CREATE TABLE ... USING graft LOCATION serves the generation-aware scan") {
    val lake = freshLake()
    lake.ingest(rows(30, "sql"))
    spark.sql("DROP TABLE IF EXISTS graft_fmt_spec")
    spark.sql(s"CREATE TABLE graft_fmt_spec USING graft " +
      s"LOCATION '${lake.cfg.location}'")
    try {
      assert(spark.sql("SELECT count(*) AS c FROM graft_fmt_spec")
        .head().getLong(0) === 30L)
      // the table tracks maintenance: a delete + compact later, SELECT
      // must resolve the CURRENT live set, not the create-time one
      assert(lake.deleteWhere(col("id") === "sql-0") === 1L)
      lake.compact()
      assert(spark.sql("SELECT count(*) AS c FROM graft_fmt_spec")
        .head().getLong(0) === 29L)
      assert(spark.sql(
        "SELECT count(DISTINCT shard) AS s FROM graft_fmt_spec")
        .head().getLong(0) >= 1L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_fmt_spec"); ()
    }
  }

  test("format writes are APPEND-ONLY ingest: append mode lands routed rows; other modes refuse") {
    val lake = freshLake()
    lake.ingest(rows(8, "w"))
    // append mode IS Lake.ingest (the full derive + staged-publish
    // path — GraftWriteSpec pins the parity); anything else refuses
    // and the lake is untouched
    rows(2, "x").write.format("graft").mode("append")
      .save(lake.cfg.location)
    assert(ids(fmt(lake)).size === 10)
    intercept[Throwable] { // default ErrorIfExists
      rows(2, "y").write.format("graft").save(lake.cfg.location)
    }
    intercept[Throwable] {
      rows(2, "y").write.format("graft").mode("overwrite")
        .save(lake.cfg.location)
    }
    assert(ids(fmt(lake)).size === 10, "a refused write must land nothing")
  }

  test("a column registered by evolve() but not yet in any file resolves through the format (null-filled)") {
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val lake = freshLake()
    lake.ingest(rows(10, "e"))
    lake.evolve(StructType(Seq(StructField("quality", DoubleType))))
    // no ingest after the evolve: the column exists ONLY in the sidecar.
    // The format's schema is pinned to the sidecar-declared one, so the
    // column must resolve (typed nulls) exactly as Lake.read() serves it
    val viaFmt = fmt(lake).select("id", "quality").collect()
      .map(r => r.getString(0) -> r.isNullAt(1)).toMap
    assert(viaFmt.size === 10 && viaFmt.values.forall(identity))
    assert(fmt(lake).schema("quality").dataType === DoubleType)
    // and post-evolve rows carry values through the same table
    lake.ingest(Seq(("e-new", Seq(1f, 0f, 0f), "d", 0.5))
      .toDF("id", "vector", "document", "quality"))
    val got = fmt(lake).where(col("id") === "e-new")
      .select("quality").collect()
    assert(got.length === 1 && got.head.getDouble(0) === 0.5)
  }

  test("introspection views through the format: history, validate, files — pure SQL, LocalScan plan") {
    val lake = freshLake()
    lake.ingest(rows(20, "h"))
    lake.seal()
    lake.ingest(rows(5, "i"))
    def view(v: String) = spark.read.format("graft")
      .option("view", v).load(lake.cfg.location)

    // history matches Lake.history(), row for row
    val viaFmt = view("history").collect().map(_.toString).toSeq
    val direct = lake.history().collect().map(_.toString).toSeq
    assert(viaFmt === direct && viaFmt.size >= 2)
    // re-resolution reflects new commits (the provider memo is per-load)
    lake.seal()
    assert(view("history").count() === lake.history().count())

    // validate: the audit row, queryable in SQL
    val audit = view("validate")
    audit.createOrReplaceTempView("graft_audit")
    val row = spark.sql(
      "SELECT rows, misrouted, dup_ids FROM graft_audit").head()
    assert(row.getLong(0) === 25L && row.getLong(1) === 0L && row.getLong(2) === 0L)

    // files: every live file with its partition and size; totals agree
    // with the data scan
    val files = view("files").collect()
    assert(files.nonEmpty && files.forall(_.getAs[Long]("bytes") > 0L))
    assert(files.map(_.getAs[String]("file")).distinct.length === files.length)
    // (compared against the Scala read's file list: the format frame
    // itself no longer reports inputFiles — GraftTable wraps, rather
    // than IS-A, FileTable, see the composition note there — and both
    // paths resolve the same live set by construction)
    assert(view("files").count() === lake.read().inputFiles.length.toLong)

    // the plan is a local relation — no file scan for metadata
    assert(scanExecs(view("history")).isEmpty)
    intercept[IllegalArgumentException](view("nope").collect())
  }

  test("an empty bootstrapped lake serves an empty frame with the canonical schema (dim option)") {
    val dir = Files.createTempDirectory("graft_fmt_empty").toString
    val df = spark.read.format("graft").option("dim", 3)
      .load(s"$dir/lake")
    assert(df.count() === 0L)
    assert(df.columns.toSet ===
      Set("id", "vector", "metadata", "document", "timestamp", "shard"))
  }

  test("sidecar self-description: no options needed, and a dim override mismatch fails loudly") {
    val lake = freshLake()
    lake.ingest(rows(6, "s"))
    // zero options: dim/metric/seed recovered from the sidecar
    assert(fmt(lake).count() === 6L)
    val e = intercept[IllegalArgumentException](
      spark.read.format("graft").option("dim", 64)
        .load(lake.cfg.location).collect())
    assert(e.getMessage.contains("dim") ||
      e.getMessage.contains("3-dim"), e.getMessage)
  }

  test("a NON-LAKE directory answers 'no sidecar' immediately — the anti-race retries are gated on a generation tree") {
    // the sidecar reader's bounded retry exists for ONE race signature:
    // generation data visible, sidecar transiently missed by a churning
    // readdir. A plain parquet dataset / checkpoint dir has files and
    // subdirs but no gen-<n> tree — it must resolve (and refuse for the
    // missing dim) without paying the 150 ms of retry sleeps per open
    val dir = Files.createTempDirectory("graft_fmt_nonlake").toString
    Seq((1, "a"), (2, "b")).toDF("n", "s")
      .write.parquet(s"$dir/data.parquet")
    new java.io.File(s"$dir/commits").mkdirs() // checkpoint-ish subdir
    // warm the format path once (class-load / FS init noise out of the
    // timing), then take the MINIMUM of three timed opens — robust to
    // transient machine load; with the retries firing EVERY open slept
    // >= 150 ms, so a sub-150 ms minimum proves the fast path
    intercept[IllegalArgumentException](
      spark.read.format("graft").load(dir))
    val samples = (0 until 3).map { _ =>
      val t0 = System.nanoTime()
      val e = intercept[IllegalArgumentException](
        spark.read.format("graft").load(dir))
      assert(e.getMessage.contains("dim"), e.getMessage)
      (System.nanoTime() - t0) / 1000000L
    }
    assert(samples.min < 150L,
      s"non-lake dir opens took ${samples.mkString(",")} ms — " +
        "retry sleeps are firing")
  }

  test("per-shard COUNT(*) reads parquet FOOTERS only: aggregate pushdown through the format") {
    // GraftScanBuilder delegates SupportsPushDownAggregates to the
    // parquet builder — with the stock conf on, a grouped count never
    // touches row data (row-group statistics only; at 100 TB that is
    // a metadata read instead of a corpus scan)
    val lake = freshLake()
    lake.ingest(rows(500, "agg"))
    val expected = lake.read().groupBy("shard").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try {
      val df = fmt(lake).groupBy("shard").count()
      assert(df.collect().map(r => (r.getInt(0), r.getLong(1))).toSet === expected)
      val scan = scanExecs(df).head.scan.description()
      assert(scan.contains("PushedAggregation: [COUNT(*)]") &&
        scan.contains("PushedGroupBy: [shard]"), scan.take(800))
    } finally spark.conf.unset("spark.sql.parquet.aggregatePushdown")
  }

  test("joins RUNTIME-prune shard directories: dynamic partition pruning through the format") {
    val dir = Files.createTempDirectory("graft_fmt_dpp").toString
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 3, numHashes = 4))
    lake.ingest((0 until 4000).map { i =>
      (s"r-$i", Seq(math.sin(i * 3).toFloat, math.cos(i * 7).toFloat,
        (i % 5 - 2).toFloat / 3), s"doc $i")
    }.toDF("id", "vector", "document"))
    // the build side must be a FILE source with a surviving selective
    // filter — a LocalRelation's filter constant-folds away before the
    // PartitionPruning rule and disqualifies DPP (matching real
    // pipelines, where the probe set comes from storage)
    (0 until 16).map(s => (s, s"n$s")).toDF("shard", "name")
      .write.parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim").where(col("name") === "n3")
    val joined = fmt(lake).join(dim, "shard")

    val expect = fmt(lake).where(col("shard") === 3).count()
    assert(joined.count() === expect, "pruned join returns the exact rows")
    joined.collect()

    // the optimizer inserted the runtime filter (stock DSv2 FileScan
    // gets NONE — this is GraftRuntimeScan's SupportsRuntimeFiltering)
    assert(joined.queryExecution.optimizedPlan.toString.contains("dynamicpruning"),
      "DPP subquery planned against the graft scan")
    val graftScan = scanExecs(joined)
      .filter(_.scan.getClass.getName.contains("GraftRuntimeScan"))
    assert(graftScan.nonEmpty, "the graft side planned as a runtime-filterable scan")
    // and the EXECUTED scan's file slice shrank to the matching
    // shard's directory — the whole point at 100 TB: the probe side's
    // keys cut the fact scan before a single task launches. The
    // runtime IN landed in the delegate's partition filters, and the
    // manifest-built file index resolves them to one directory.
    val pruned = graftScan.head.scan
      .asInstanceOf[graft.sources.GraftRuntimeScan].underlying
    assert(pruned.partitionFilters.exists(_.toString.contains("IN")),
      s"runtime IN not folded into partition filters: ${pruned.partitionFilters}")
    val readFiles = pruned.fileIndex
      .listFiles(pruned.partitionFilters, pruned.dataFilters)
      .flatMap(_.files).map(_.getPath.toString)
    assert(readFiles.nonEmpty)
    assert(readFiles.forall(_.contains("shard=3")),
      s"runtime-pruned scan read outside shard=3: " +
        readFiles.filterNot(_.contains("shard=3")).take(3))
  }
}
