package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** [[graft.Lake.cloneTo]] — the deep-clone / experiment-fork op: a
  * byte-faithful, fully independent copy of the current state or an
  * `asOf` snapshot. Pins: stored-column equality (ids, timestamps,
  * routing, packed bits, evolve extras), snapshot semantics, target
  * refusals, and lifecycle independence in both directions. */
class CloneSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_clone_spec").toString

  private def rows(n: Int) = (0 until n).map { i =>
    (Seq(math.sin(i * 3).toFloat, math.cos(i * 7).toFloat,
      (i % 5 - 2).toFloat / 3, -math.sin(i).toFloat),
      s"doc-$i", s"id-$i")
  }.toDF("vector", "document", "id")

  private def fingerprint(l: Lake): Set[String] =
    l.read()
      .select(concat_ws("|", col("id"), col("document"), col("shard"),
        col("timestamp").cast("long"), col("vector").cast("string")))
      .as[String].collect().toSet

  test("full clone: every stored column identical, including packed bits and evolve extras") {
    val src = Lake(spark, LakeConfig(tmp() + "/src", dim = 4,
      numHashes = 2, packSignBits = true))
    src.ingest(rows(40))
    src.evolve(StructType(Seq(StructField("quality", DoubleType))))
    src.ingest(Seq((Seq(1f, 0f, 0f, -1f), "doc-q", "id-q", 0.7))
      .toDF("vector", "document", "id", "quality"))

    val clone = src.cloneTo(tmp() + "/dst")
    assert(fingerprint(clone) === fingerprint(src))
    // packed bits survived byte-for-byte (no re-derive ran)
    val packs = (l: Lake) => l.read().select("id", "packed")
      .as[(String, Long)].collect().toMap
    assert(packs(clone) === packs(src))
    // the evolve extra came across with its value and its registration
    assert(clone.read().where(col("document") === "doc-q")
      .select("quality").as[Double].head() === 0.7)
    assert(clone.read().schema.fieldNames.contains("quality"))
  }

  test("asOf clone serves the sealed snapshot, not the mutated present") {
    val src = Lake(spark, LakeConfig(tmp() + "/src", dim = 4, numHashes = 2))
    src.ingest(rows(30))
    val before = fingerprint(src)
    val v = src.seal()
    // mutate past the seal: delete, upsert-replace, append, compact
    src.deleteWhere(col("document").isin("doc-1", "doc-2", "doc-3"))
    src.ingest(Seq((Seq(9f, 9f, 9f, 9f), "doc-new", "id-new"))
      .toDF("vector", "document", "id"))
    src.compact()
    assert(fingerprint(src) !== before, "mutations changed the present")

    val clone = src.cloneTo(tmp() + "/dst", asOf = Some(v))
    assert(fingerprint(clone) === before,
      "the asOf clone is the pre-mutation row set")
  }

  test("refusals: non-empty target, self-clone, vacuumed snapshot; a lesser config cannot clone") {
    val src = Lake(spark, LakeConfig(tmp() + "/src", dim = 4,
      numHashes = 2, packSignBits = true))
    src.ingest(rows(10))
    // target already a lake
    val taken = tmp() + "/taken"
    Lake(spark, LakeConfig(taken, dim = 4, numHashes = 2,
      packSignBits = true)).bootstrap()
    intercept[IllegalArgumentException](src.cloneTo(taken))
    // self-clone
    intercept[IllegalArgumentException](src.cloneTo(src.cfg.location))
    // vacuumed snapshot fails loudly through readAt's detectors
    val v = src.seal()
    src.compact()
    src.vacuum()
    intercept[IllegalStateException](src.cloneTo(tmp() + "/dst", Some(v)))
    // a session without the lake's compression must not stamp a clone
    // whose sidecar misdescribes the copied packed column
    val lesser = Lake(spark, LakeConfig(src.cfg.location, dim = 4, numHashes = 2))
    val e = intercept[IllegalArgumentException](lesser.cloneTo(tmp() + "/lesser"))
    assert(e.getMessage.contains("packSignBits"))
  }

  test("independence: clone and source maintain, mutate, and vacuum without touching each other") {
    val src = Lake(spark, LakeConfig(tmp() + "/src", dim = 4, numHashes = 2))
    src.ingest(rows(25))
    val clone = src.cloneTo(tmp() + "/dst")
    val srcBefore = fingerprint(src)

    // mutate + maintain the CLONE: source bit-unchanged
    clone.deleteWhere(col("document") === "doc-0")
    clone.ingest(Seq((Seq(5f, 5f, 5f, 5f), "clone-only", "id-c"))
      .toDF("vector", "document", "id"))
    clone.compact()
    clone.vacuum()
    assert(fingerprint(src) === srcBefore)

    // mutate + VACUUM the SOURCE: the clone's files are its own — a
    // source rewrite retiring every original file cannot reach them
    val cloneNow = fingerprint(clone)
    src.deleteWhere(lit(true))
    src.compact()
    src.repair()
    assert(fingerprint(clone) === cloneNow)
    assert(clone.read().count() === 25L)
  }

  test("clone via SQL: CALL lakes.system.clone round-trips and reports the row count") {
    val w = Files.createTempDirectory("graft_clone_wh").toString
    spark.conf.set("spark.sql.catalog.clakes",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.clakes.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS clakes.default")
    spark.sql("""CREATE TABLE clakes.default.src (vector array<float>, document string)
                 USING graft OPTIONS (dim '4', numHashes '2')""")
    spark.sql("""INSERT INTO clakes.default.src (vector, document)
                 VALUES (array(1.0F, 0.0F, 0.0F, 0.0F), 'a'),
                        (array(0.0F, 1.0F, 0.0F, 0.0F), 'b')""")
    val dst = tmp() + "/dst"
    val r = spark.sql(
      s"CALL clakes.system.clone(table => 'default.src', target_location => '$dst')")
      .collect().head
    assert(r.getString(0) === dst)
    assert(r.getLong(1) === 2L)
    // the clone is itself a readable lake, adoptable by the catalog
    assert(spark.read.format("graft").load(dst).count() === 2L)
  }
}
