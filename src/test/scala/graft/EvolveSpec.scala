package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema evolution: [[Lake.evolve]] widens the stored schema with a
  * sidecar commit — never a reload. Old generations read back
  * null-filled, ingest carries the columns (cast or typed-null), every
  * rewrite preserves them, the change feed and the `graft` DSv2 format
  * serve them, and validate() reports the pre-evolve row count. */
class EvolveSpec extends SparkSpec {
  import spark.implicits._

  private def rows(n: Int, tag: String) =
    (0 until n).map { i =>
      (s"$tag-$i", Seq(math.sin(i * 3 + tag.length).toFloat,
        math.cos(i * 7).toFloat, (i % 5 - 2).toFloat / 3), s"doc $tag $i")
    }.toDF("id", "vector", "document")

  private def freshLake(): Lake = {
    val dir = Files.createTempDirectory("graft_evolve").toString
    Lake(spark, LakeConfig(s"$dir/lake", dim = 3, numHashes = 2))
  }

  private def ids(df: DataFrame): Set[String] =
    df.select("id").collect().map(_.getString(0)).toSet

  test("evolve widens with a sidecar commit: old rows null-filled, new ingests carry cast values") {
    val lake = freshLake()
    lake.ingest(rows(10, "old"))
    lake.evolve(StructType(Seq(
      StructField("lang", StringType), StructField("quality", DoubleType))))
    // pre-evolve rows read back with typed nulls
    val after = lake.read()
    assert(after.schema("lang").dataType === StringType)
    assert(after.schema("quality").dataType === DoubleType)
    assert(after.where(col("lang").isNotNull || col("quality").isNotNull)
      .count() === 0L)
    // post-evolve ingest: supplied values are CAST to the registered
    // type (quality arrives as int), an absent column is typed null
    lake.ingest((0 until 5).map { i =>
      (s"new-$i", Seq(1f, 0f, i.toFloat / 5), s"doc new $i", "en", i)
    }.toDF("id", "vector", "document", "lang", "quality"))
    lake.ingest(Seq(("half-0", Seq(0f, 1f, 0f), "doc half", "de"))
      .toDF("id", "vector", "document", "lang"))
    val got = lake.read().where(col("id").startsWith("new-"))
      .select("id", "lang", "quality").collect()
    assert(got.length === 5 && got.forall(r =>
      r.getString(1) == "en" && !r.isNullAt(2)))
    assert(lake.read().where(col("id") === "half-0")
      .select("quality").head().isNullAt(0),
      "absent evolved column must ingest as typed null")
    // drift visibility: exactly the 10 pre-evolve rows are all-null
    val audit = lake.validate().head()
    assert(audit.getAs[Long]("pre_evolve_rows") === 10L)
    assert(audit.getAs[Long]("rows") === 16L)
  }

  test("rewrites preserve evolved columns; an upsert changing ONLY an extra is a real netted delta") {
    val lake = freshLake()
    lake.ingest(rows(12, "a"))
    lake.evolve(StructType(Seq(StructField("lang", StringType))))
    lake.ingest(Seq(("b-0", Seq(0.5f, 0.5f, 0f), "doc b", "fr"))
      .toDF("id", "vector", "document", "lang"))
    // deleteWhere rewrites b-0's whole shard — lang must survive
    assert(lake.deleteWhere(col("id") === "a-0") === 1L)
    assert(lake.read().where(col("id") === "b-0")
      .select("lang").head().getString(0) === "fr")
    // upsert replacing ONLY the extra column's value
    val v1 = lake.seal()
    assert(lake.upsert(Seq(("b-0", Seq(0.5f, 0.5f, 0f), "doc b", "es"))
      .toDF("id", "vector", "document", "lang")) === 1L)
    assert(lake.read().where(col("id") === "b-0")
      .select("lang").head().getString(0) === "es")
    // the evolved column participates in netting identity: the change
    // is visible as delete(fr) + insert(es), not netted away
    val delta = lake.changesSince(v1)
      .where(col("id") === "b-0")
      .select("lang", "change").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(delta === Set(("fr", "delete"), ("es", "insert")),
      s"extra-only upsert must surface in the netted feed, got $delta")
    // compact rewrites everything — values still intact, read equal
    val before = lake.read().select("id", "lang").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    lake.compact()
    val after2 = lake.read().select("id", "lang").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(after2 === before, "compact must preserve evolved columns")
    assert(after2("b-0") === Some("es"))
  }

  test("evolve refusals: collisions with stored/partition/registered names, duplicates in one call") {
    val lake = freshLake()
    lake.ingest(rows(4, "r"))
    Seq("document", "shard", "id", "timestamp").foreach { taken =>
      val e = intercept[IllegalArgumentException](
        lake.evolve(StructType(Seq(StructField(taken, StringType)))))
      assert(e.getMessage.contains("already exists"), e.getMessage)
    }
    val e2 = intercept[IllegalArgumentException](lake.evolve(StructType(Seq(
      StructField("x", StringType), StructField("x", IntegerType)))))
    assert(e2.getMessage.contains("duplicate"))
    lake.evolve(StructType(Seq(StructField("x", StringType))))
    val e3 = intercept[IllegalArgumentException](
      lake.evolve(StructType(Seq(StructField("x", StringType)))))
    assert(e3.getMessage.contains("already exists"))
    // names the query surfaces DERIVE onto outputs would be silently
    // clobbered (topK's "dist", the feed's "change") or corrupt a
    // rewrite-plan join ("n_slices") — refused at registration
    Seq("change", "dist", "n_slices", "_mcmp", "shard_s").foreach { reserved =>
      val e = intercept[IllegalArgumentException](
        lake.evolve(StructType(Seq(StructField(reserved, StringType)))))
      assert(e.getMessage.contains("reserved"), s"$reserved: ${e.getMessage}")
    }
  }

  test("the graft DSv2 format and a fresh change-feed subscription serve evolved columns") {
    val lake = freshLake()
    lake.ingest(rows(6, "f"))
    lake.evolve(StructType(Seq(StructField("score", DoubleType))))
    lake.ingest(Seq(("g-0", Seq(0f, 0f, 1f), "doc g", 0.9))
      .toDF("id", "vector", "document", "score"))
    // batch format: merged footers discover the evolved column; old
    // files null-fill
    val fmt = spark.read.format("graft").load(lake.cfg.location)
    assert(fmt.columns.contains("score"))
    assert(fmt.where(col("id") === "g-0").select("score").head().getDouble(0) === 0.9)
    assert(fmt.where(col("score").isNotNull).count() === 1L)
    assert(ids(fmt) === ids(lake.read()))
    // change feed schema (fresh subscription) includes the extra, and
    // the netted delta carries its values
    val feed = spark.readStream.format("graft-changes")
      .option("location", lake.cfg.location)
      .option("dim", 3).option("numHashes", 2)
      .load()
    assert(feed.columns.contains("score"))
    val q = feed.select("id", "score", "change")
      .writeStream.format("memory").queryName("evolve_feed")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val snap = spark.table("evolve_feed").collect()
        .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      assert(snap.length === 7)
      assert(snap.toMap.apply("g-0") === Some(0.9))
    } finally q.stop()
  }
}
