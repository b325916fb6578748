package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md /
  * FIXTURES.md §B). One parquet file per table under `$dir/`.
  *
  * All queries take the table directory as a parameter so the same code
  * runs at any scale factor — at cluster scale `dir` would be an
  * `s3a://bucket/prefix` and nothing else changes (Spark's Hadoop FS
  * layer handles the tiering the reference hand-rolls in its S3Bucket,
  * /root/reference/vector_lake/core/index.py:344-428).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Analyzed-plan cache: `spark.read.parquet` lists files and reads
    * footers for schema inference on EVERY call; a registry run touches
    * the same tables dozens of times. DataFrames are immutable plans, so
    * reusing one per (session, path) is safe and shaves fixed per-query
    * planning cost (no data is cached — scans stay lazy).
    *
    * SCOPE: for the IMMUTABLE driver-generated fixture tables only —
    * the cached plan pins the file listing captured at first load, so
    * files appended to a path later are invisible to subsequent load()
    * calls. Lake data (which mutates) never goes through this cache;
    * `Lake.read()` re-lists on every call. Bounded by construction:
    * ≤ |sessions| × |scale factors| × 10 table entries. */
  private val planCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    planCache.computeIfAbsent((spark, s"$dir/$name.parquet"),
      k => k._1.read.parquet(k._2))

  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects; read nanos as long (legacy conf) and convert to a
    * microsecond TimestampType column (integer div — exact for any
    * sub-second truncation we do downstream). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // resolve the base entry BEFORE the converted-frame computeIfAbsent:
    // a nested computeIfAbsent on the same map is a "Recursive update"
    // IllegalStateException when the base entry isn't populated yet
    val base = load(spark, dir, "events")
    planCache.computeIfAbsent((spark, s"$dir/events.parquet#converted"),
      _ => {
        import org.apache.spark.sql.functions.{col, expr}
        import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
        // the fixture's ts column has shipped in several parquet shapes
        // across driver rounds — normalize every one to a session-TZ
        // TimestampType (the session TZ is pinned UTC, so the NTZ cast
        // is value-preserving):
        base.schema("ts").dataType match {
          // TIMESTAMP(NANOS), read as long under nanosAsLong (conf above)
          case LongType => base.withColumn("ts",
            expr("timestamp_micros(ts div 1000)"))
          // plain timestamp[us] with isAdjustedToUTC=false
          case TimestampNTZType => base.withColumn("ts",
            col("ts").cast(TimestampType))
          case TimestampType => base
          case other => throw new IllegalStateException(
            s"events.ts: unexpected parquet-inferred type $other")
        }
      })
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
}
