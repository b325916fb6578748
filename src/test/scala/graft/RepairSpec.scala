package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** [[graft.Lake.repairFrom]] — anti-entropy repair, the heal half of
  * the [[graft.Lake.diffStats]] audit/heal pair. Pins: end-state
  * equality through the full divergence mix (missing rows, extra
  * rows, count-neutral tampering), healthy shards left byte-in-place
  * path-for-path, a source-dropped shard deleted without writing a
  * row, the already-converged no-op, and source schema evolution
  * riding the repair. */
class RepairSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_repair_spec").toString

  private def rows(n: Int, tag: String = "doc") = (0 until n).map { i =>
    (Seq(math.sin(i * 3).toFloat, math.cos(i * 7).toFloat,
      (i % 5 - 2).toFloat / 3, -math.sin(i).toFloat),
      s"$tag-$i", s"id-$tag-$i")
  }.toDF("vector", "document", "id")

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

  /** Live parquet files keyed by shard value — the byte-in-place pin. */
  private def filesByShard(l: Lake): Map[String, Set[String]] =
    l.read().inputFiles.toSet
      .groupBy((p: String) => p.split("/").takeRight(2).head)

  test("repairFrom heals missing, extra, and count-neutral-tampered rows; healthy shards stay byte-in-place") {
    val src = Lake(spark, LakeConfig(tmp() + "/src", dim = 4, numHashes = 2))
    src.ingest(rows(60))
    val rep = src.cloneTo(tmp() + "/rep")

    // the full divergence mix, all out-of-band on the REPLICA:
    rep.deleteWhere(col("document").isin("doc-3", "doc-17")) // missing
    rep.ingest(rows(4, "ghost")) // extra rows the source never had
    // count-neutral tamper: same id, same vector (same shard), doc swapped
    rep.upsert(rep.read().where(col("id") === "id-doc-9")
      .select(col("vector"), lit("tampered").as("document"), col("id")))

    val audit = rep.diffStats(src)
    val convicted = audit.where(!col("in_sync"))
      .select("shard").as[Int].collect().toSet
    assert(convicted.nonEmpty && audit.count() > convicted.size,
      "the mix must convict SOME shards, not all")
    val before = filesByShard(rep)

    val (shards, rewritten) = rep.repairFrom(src)
    assert(shards === convicted.size.toLong)
    assert(rewritten ===
      src.read().where(col("shard").isin(convicted.toSeq: _*)).count())
    assert(fingerprint(rep) === fingerprint(src))
    assert(rep.diffStats(src).where(!col("in_sync")).isEmpty)
    assert(rep.validate().head().getAs[Long]("misrouted") === 0L)

    // healthy shards: the SAME files, path for path; convicted: rewritten
    val after = filesByShard(rep)
    for ((shard, files) <- before)
      if (!convicted.contains(shard.split("=", 2)(1).toInt))
        assert(after(shard) === files, s"healthy $shard was touched")
      else assert((after.getOrElse(shard, Set.empty) intersect files).isEmpty,
        s"convicted $shard kept stale files")
  }

  test("an in-sync replica repairs to (0, 0) with the live file set untouched") {
    val src = Lake(spark, LakeConfig(tmp() + "/src", dim = 4, numHashes = 2))
    src.ingest(rows(30))
    val rep = src.cloneTo(tmp() + "/rep")
    val before = filesByShard(rep)
    assert(rep.repairFrom(src) === ((0L, 0L)))
    assert(filesByShard(rep) === before, "no-op repair must rewrite nothing")
  }

  test("a shard the source dropped wholesale is deleted from the replica without writing a row") {
    val src = Lake(spark, LakeConfig(tmp() + "/src", dim = 4, numHashes = 2))
    src.ingest(rows(40))
    val rep = src.cloneTo(tmp() + "/rep")
    val victim = src.read().select("shard").as[Int].head()
    src.deleteWhere(col("shard") === victim)
    assert(src.read().where(col("shard") === victim).isEmpty)

    val (shards, rewritten) = rep.repairFrom(src)
    assert(shards === 1L && rewritten === 0L,
      "sole divergence = the dropped shard; nothing to copy")
    assert(rep.read().where(col("shard") === victim).isEmpty)
    assert(fingerprint(rep) === fingerprint(src))
  }

  test("source schema evolution rides the repair: extras auto-register, convicted shards carry values") {
    val src = Lake(spark, LakeConfig(tmp() + "/src", dim = 4, numHashes = 2))
    src.ingest(rows(30))
    val rep = src.cloneTo(tmp() + "/rep")

    src.evolve(StructType(Seq(StructField("score", DoubleType))))
    // diverge ONE row's shared content on the source so its shard is
    // convicted — and give the replacement an evolved value to carry
    val moved = src.read().where(col("id") === "id-doc-5")
      .select(col("vector"), lit("rescored").as("document"), col("id"),
        lit(0.75).as("score"))
    src.upsert(moved)
    val shard5 = src.read().where(col("id") === "id-doc-5")
      .select("shard").as[Int].head()

    val (shards, _) = rep.repairFrom(src)
    assert(shards >= 1L)
    assert(rep.read().columns.contains("score"),
      "the evolved column must auto-register on the replica")
    assert(rep.read().where(col("id") === "id-doc-5")
      .select("score").as[Double].head() === 0.75)
    // healthy shards read the evolved column as the typed null fill
    assert(rep.read().where(col("shard") =!= shard5 && col("score").isNotNull)
      .isEmpty)
    assert(fingerprint(rep) === fingerprint(src))
  }

  test("anti-entropy from SQL: CALL heal repairs an out-of-band-mutated replica") {
    val w = Files.createTempDirectory("graft_repair_wh").toString
    spark.conf.set("spark.sql.catalog.hlakes",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.hlakes.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS hlakes.default")
    spark.sql("""CREATE TABLE hlakes.default.src (vector array<float>, document string)
                 USING graft OPTIONS (dim '4', numHashes '2')""")
    spark.sql("""INSERT INTO hlakes.default.src (vector, document)
                 VALUES (array(1.0F, 0.0F, 0.0F, 0.0F), 'a'),
                        (array(0.0F, 1.0F, 0.0F, 0.0F), 'b'),
                        (array(0.0F, 0.0F, 1.0F, 0.0F), 'c')""")
    val rep = tmp() + "/rep"
    spark.sql(s"""CALL hlakes.system.clone(table => 'default.src',
                    target_location => '$rep')""")
    // out-of-band divergence on the replica — no feed to replay
    val repLake = Lake(spark, LakeConfig(rep, dim = 4, numHashes = 2))
    repLake.deleteWhere(col("document") === "b")
    // the SQL audit convicts BEFORE the heal...
    val audit = spark.sql(
      s"""CALL hlakes.system.diff(replica => '$rep', source => 'default.src')""")
      .head()
    assert(audit.getLong(1) >= 1L &&
      audit.getLong(2) === audit.getLong(3) - 1L,
      s"diff must convict the deletion: $audit")
    val r = spark.sql(
      s"""CALL hlakes.system.heal(replica => '$rep', source => 'default.src')""")
      .head()
    assert(r.getLong(0) >= 1L && r.getLong(1) >= 1L)
    assert(spark.read.format("graft").load(rep)
      .select("document").as[String].collect().sorted.toSeq ===
      Seq("a", "b", "c"))
    // converged: a second CALL is a no-op, and the audit reads clean
    val again = spark.sql(
      s"""CALL hlakes.system.heal(replica => '$rep', source => 'default.src')""")
      .head()
    assert(again.getLong(0) === 0L && again.getLong(1) === 0L)
    val clean = spark.sql(
      s"""CALL hlakes.system.diff(replica => '$rep', source => 'default.src')""")
      .head()
    assert(clean.getLong(1) === 0L && clean.getLong(2) === clean.getLong(3))
  }
}
