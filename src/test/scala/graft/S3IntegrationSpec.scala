package graft

import org.apache.spark.sql.functions._

/** REAL-`s3a://` integration suite, env-gated like the reference's own
  * S3 tests (tests/conftest.py:33-42 gate on RUN_S3_TESTS): skipped
  * unless `RUN_S3_TESTS=1`, in which case it runs the ObjectStoreSpec
  * scenarios against a live S3-compatible endpoint (AWS, MinIO, or
  * localstack).
  *
  * Configuration (all via env):
  *  - `RUN_S3_TESTS=1`       — enables the suite
  *  - `S3_TEST_BUCKET`       — bucket to write under (default graft-test)
  *  - `S3_ENDPOINT`          — optional MinIO/localstack endpoint; sets
  *                             path-style access + plain HTTP
  *  - AWS credentials        — the standard AWS_ACCESS_KEY_ID /
  *                             AWS_SECRET_ACCESS_KEY chain s3a reads
  *
  * Needs `hadoop-aws` (+ its aws-sdk bundle) on the classpath — not
  * shipped in the offline build image, which is why the in-tree
  * `bucket://` BucketFs (ObjectStoreSpec) carries the semantics
  * offline: copy+delete rename, PUT-created lock files, strong listing.
  * Everything asserted here is the SAME contract, against the real
  * thing. */
class S3IntegrationSpec extends SparkSpec {
  import spark.implicits._

  private val enabled = sys.env.get("RUN_S3_TESTS").contains("1")

  private def s3Root(): String = {
    val bucket = sys.env.getOrElse("S3_TEST_BUCKET", "graft-test")
    sys.env.get("S3_ENDPOINT").foreach { ep =>
      val conf = spark.sparkContext.hadoopConfiguration
      conf.set("fs.s3a.endpoint", ep)
      conf.set("fs.s3a.path.style.access", "true")
      conf.set("fs.s3a.connection.ssl.enabled", "false")
    }
    s"s3a://$bucket/graft_it_${java.util.UUID.randomUUID()}"
  }

  private def gate(): Unit = assume(enabled,
    "real-S3 integration is env-gated: set RUN_S3_TESTS=1 (plus " +
      "S3_TEST_BUCKET / S3_ENDPOINT / AWS credentials) and put " +
      "hadoop-aws on the classpath to run")

  test("s3a: ingest -> read -> topK -> maintenance round-trips on real S3") {
    gate()
    val lake = Lake(spark, LakeConfig(s"${s3Root()}/lake", dim = 5, numHashes = 4))
    try {
      assert(lake.count() === 0L) // empty bootstrap
      val v = Seq(0.1, 0.2, 0.3, 0.4, 0.5)
      lake.ingest(Seq((v.map(_.toFloat), "remote doc", "r-0"),
        (Seq(-0.5f, 0.4f, -0.3f, 0.2f, -0.1f), "other", "r-1"))
        .toDF("vector", "document", "id"))
      assert(lake.count() === 2L)
      val files = lake.read().inputFiles
      assert(files.nonEmpty && files.forall(_.startsWith("s3a:")),
        files.mkString(","))
      val hit = lake.topKExact(v, 1).collect().head
      assert(hit.getAs[String]("document") === "remote doc")
      // a rewrite commits atomically through the generation pointer
      // even where rename is copy+delete
      assert(lake.deleteWhere(col("id") === "r-1") === 1L)
      assert(lake.count() === 1L)
      val report = lake.maintain(retainMs = 0L)
      assert(lake.count() === 1L, s"maintain must preserve rows ($report)")
    } finally { lake.delete(); () }
  }

  test("s3a: change feed seals and nets deltas on real S3") {
    gate()
    val lake = Lake(spark, LakeConfig(s"${s3Root()}/lake", dim = 3, numHashes = 2))
    try {
      lake.ingest(Seq(("a", Seq(1f, 0f, 0f), "da"), ("b", Seq(0f, 1f, 0f), "db"))
        .toDF("id", "vector", "document"))
      val v1 = lake.seal()
      lake.deleteWhere(col("id") === "a")
      lake.ingest(Seq(("c", Seq(0f, 0f, 1f), "dc")).toDF("id", "vector", "document"))
      val delta = lake.changesSince(v1).select("id", "change").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(delta === Set(("a", "delete"), ("c", "insert")))
    } finally { lake.delete(); () }
  }

  test("s3a: skip index + schema evolution round-trip on real S3") {
    gate()
    val lake = Lake(spark, LakeConfig(s"${s3Root()}/lake", dim = 3, numHashes = 2))
    try {
      lake.ingest((0 until 12).map(i =>
        (s"k-$i", Seq(math.sin(i).toFloat, math.cos(i).toFloat, 0.1f * i), s"doc $i"))
        .toDF("id", "vector", "document"))
      assert(lake.buildSkipIndex() > 0L)
      assert(lake.lookup(Seq("k-3")).select("document").head().getString(0) === "doc 3")
      lake.evolve(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("lang",
          org.apache.spark.sql.types.StringType))))
      lake.ingest(Seq(("k-new", Seq(1f, 1f, 1f), "doc new", "en"))
        .toDF("id", "vector", "document", "lang"))
      val got = lake.read().where(col("id").isin("k-3", "k-new"))
        .select("id", "lang").collect()
        .map(r => r.getString(0) -> Option(r.getString(1))).toMap
      assert(got === Map("k-3" -> None, "k-new" -> Some("en")))
    } finally { lake.delete(); () }
  }
}
