package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** [[graft.Lake.applyChanges]]/[[graft.Lake.syncFrom]] — the
  * churn-proportional replication step: a replica cut by [[graft.Lake
  * .cloneTo]] at seal A follows its source to seal B by applying the
  * netted change feed. Pins: end-state equality through the full
  * mutation mix (deletes, shard-moving replacements, inserts, a
  * compaction that must net to zero), chained syncs, convergence on
  * re-application, schema evolution riding the feed, and the SQL
  * procedure face. */
class SyncSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_sync_spec").toString

  private def rows(n: Int) = (0 until n).map { i =>
    (Seq(math.sin(i * 3).toFloat, math.cos(i * 7).toFloat,
      (i % 5 - 2).toFloat / 3, -math.sin(i).toFloat),
      s"doc-$i", s"id-$i")
  }.toDF("vector", "document", "id")

  private def fingerprint(l: Lake): Set[String] = {
    val df = l.read()
    val cols = df.schema.fields.sortBy(_.name).map { f =>
      f.dataType match {
        // maps have no deterministic serialization order — sort entries
        case _: org.apache.spark.sql.types.MapType =>
          array_sort(map_entries(col(f.name))).cast("string")
        case _ => col(f.name).cast("string")
      }
    }
    df.select(concat_ws("|", cols.toIndexedSeq: _*)).as[String].collect().toSet
  }

  test("replica follows the source through deletes, shard-moving replacements, inserts, and a compaction") {
    val src = Lake(spark, LakeConfig(tmp() + "/src", dim = 4, numHashes = 2))
    src.ingest(rows(40))
    val a = src.seal()
    val replica = src.cloneTo(tmp() + "/rep", asOf = Some(a))

    // the full mutation mix between the seals
    src.deleteWhere(col("document").isin("doc-1", "doc-2", "doc-9"))
    // negate-replace: flipped sign bits MOVE these rows across shards
    src.upsert(src.read().where(col("document").isin("doc-4", "doc-5"))
      .select(transform(col("vector"), v => -v).as("vector"),
        col("document"), col("id")))
    src.ingest(Seq((Seq(7f, 0f, -7f, 1f), "doc-new", "id-new"))
      .toDF("vector", "document", "id"))
    src.compact() // rewritten-but-identical rows must net to ZERO in the feed
    val b = src.seal()

    val (deleted, inserted) = replica.syncFrom(src, a, b)
    assert(deleted === 5L, "3 deletes + 2 replaced old versions leave")
    assert(inserted === 3L, "2 replacements + 1 fresh insert land")
    assert(fingerprint(replica) === fingerprint(src))
    // routing stayed valid on the replica (no misroutes after the
    // shard-moving replacements)
    assert(replica.validate().head().getAs[Long]("misrouted") === 0L)
  }

  test("chained syncs advance seal by seal; re-applying a delta converges instead of duplicating") {
    val src = Lake(spark, LakeConfig(tmp() + "/src", dim = 4, numHashes = 2))
    src.ingest(rows(20))
    val a = src.seal()
    val replica = src.cloneTo(tmp() + "/rep", asOf = Some(a))

    src.deleteWhere(col("document") === "doc-0")
    val b = src.seal()
    src.ingest(Seq((Seq(1f, 2f, 3f, 4f), "late", "id-late"))
      .toDF("vector", "document", "id"))
    val c = src.seal()

    replica.syncFrom(src, a, b)
    replica.syncFrom(src, b, c)
    assert(fingerprint(replica) === fingerprint(src))

    // re-apply the last delta: convergence netting proves every row
    // already present and rewrites NOTHING — (0, 0), not a re-churn
    // (safe after a crashed half-applied step is retried)
    assert(replica.syncFrom(src, b, c) === ((0L, 0L)))
    assert(fingerprint(replica) === fingerprint(src))
    assert(replica.read().count() === src.read().count())
  }

  test("schema evolution rides the feed: the replica auto-evolves and serves the new column") {
    val src = Lake(spark, LakeConfig(tmp() + "/src", dim = 4, numHashes = 2))
    src.ingest(rows(10))
    val a = src.seal()
    val replica = src.cloneTo(tmp() + "/rep", asOf = Some(a))

    src.evolve(StructType(Seq(StructField("quality", DoubleType))))
    src.ingest(Seq((Seq(0f, 1f, 1f, 0f), "doc-q", "id-q", 0.9))
      .toDF("vector", "document", "id", "quality"))
    val b = src.seal()

    replica.syncFrom(src, a, b)
    assert(replica.read().schema.fieldNames.contains("quality"))
    assert(replica.read().where(col("document") === "doc-q")
      .select("quality").as[Double].head() === 0.9)
    // pre-evolve replica rows null-fill, same as the source
    assert(replica.read().where(col("quality").isNull).count() ===
      src.read().where(col("quality").isNull).count())
  }

  test("refusals: a frame without the change column, and unknown change kinds") {
    val l = Lake(spark, LakeConfig(tmp() + "/lake", dim = 4, numHashes = 2))
    l.ingest(rows(5))
    val e1 = intercept[IllegalArgumentException](
      l.applyChanges(l.read()))
    assert(e1.getMessage.contains("change"))
    val e2 = intercept[IllegalArgumentException](
      l.applyChanges(l.read().withColumn("change", lit("upsert"))))
    assert(e2.getMessage.contains("unknown change kind"))
    // a delta smuggling a RESERVED extra column (a legit feed can never
    // carry one — the source's evolve refuses them) hits the same
    // validation as evolve(), not a silent sidecar registration
    val e3 = intercept[IllegalArgumentException](
      l.applyChanges(l.read()
        .withColumn("dist", lit(0.0))
        .withColumn("change", lit("insert"))))
    assert(e3.getMessage.contains("reserved"), e3.getMessage)
    // a delta missing BASE stored columns would null-pad them into
    // corrupt rows (null vectors) or the default partition (null
    // shard) — refused, only evolved extras may be absent
    val e4 = intercept[IllegalArgumentException](
      l.applyChanges(l.read().select("id", "document")
        .withColumn("change", lit("insert"))))
    assert(e4.getMessage.contains("missing stored column"), e4.getMessage)
    assert(l.read().count() === 5L, "refused applies changed nothing")
  }

  /** Model-based replication fuzz: a seeded random mutation sequence
    * over the source's full mutating surface (ingest, delete,
    * shard-moving negate-upserts, compaction, schema evolution), with
    * the replica advancing by netted syncs at random intervals — every
    * sync point must land the replica bit-equal to the source, and
    * occasional duplicate re-applies must net to (0, 0). The
    * interleavings (a compaction between two syncs, an evolve mid-
    * interval, a delta that is pure rewrite churn) all arise naturally
    * from the sequence. Seeded: failures replay. */
  test("property: random mutation sequences replicate exactly through chained syncs") {
    val rng = new scala.util.Random(20260814L)
    val base = tmp()
    val src = Lake(spark, LakeConfig(base + "/src", dim = 4, numHashes = 2))
    src.ingest(rows(40))
    var lastSeal = src.seal()
    val replica = src.cloneTo(base + "/rep", asOf = Some(lastSeal))
    var nextId = 1000
    var evolved = 0
    var extraCols = Vector.empty[String]
    def storedSel = (Seq("vector", "document", "id") ++ extraCols).map(col)
    var syncs = 0
    for (step <- 1 to 24) {
      rng.nextInt(6) match {
        case 0 | 5 => // fresh ingest (extras carry a value when present)
          val n = 1 + rng.nextInt(4)
          val df = (0 until n).map { k =>
            (Seq.fill(4)(rng.nextGaussian().toFloat), s"d-${nextId + k}",
              s"id-${nextId + k}")
          }.toDF("vector", "document", "id")
          src.ingest(extraCols.foldLeft(df)((d, c) =>
            d.withColumn(c, concat(col("id"), lit(":" + c)))))
          nextId += n
        case 1 => // delete a random handful
          val ids = src.read().select("id").as[String].collect().toSeq
          if (ids.nonEmpty)
            src.deleteWhere(col("id").isin(
              rng.shuffle(ids).take(1 + rng.nextInt(3)): _*))
        case 2 => // negate-upsert: replaced rows MOVE shards
          val ids = src.read().select("id").as[String].collect().toSeq
          if (ids.nonEmpty) {
            val pick = rng.shuffle(ids).take(1 + rng.nextInt(3))
            src.upsert(src.read().where(col("id").isin(pick: _*))
              .select(storedSel: _*)
              .withColumn("vector", transform(col("vector"), v => -v)))
          }
        case 3 => src.compact() // pure rewrite churn must net to zero
        case 4 if evolved < 2 =>
          val name = s"fz$evolved"
          src.evolve(org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(name,
              org.apache.spark.sql.types.StringType))))
          extraCols :+= name; evolved += 1
        case _ => ()
      }
      if (rng.nextInt(2) == 0 || step == 24) {
        val b = src.seal()
        if (b != lastSeal) {
          replica.syncFrom(src, lastSeal, b)
          if (rng.nextBoolean()) // duplicate re-apply must converge
            assert(replica.syncFrom(src, lastSeal, b) === ((0L, 0L)),
              s"step $step: re-applied delta was not a no-op")
          lastSeal = b
          syncs += 1
        }
        assert(fingerprint(replica) === fingerprint(src),
          s"step $step: replica diverged from source")
      }
    }
    assert(syncs >= 3, s"fuzz exercised only $syncs syncs — weak sequence")
    assert(replica.validate().head().getAs[Long]("misrouted") === 0L)
  }

  test("the whole replication loop from SQL: CALL clone then CALL sync") {
    val w = Files.createTempDirectory("graft_sync_wh").toString
    spark.conf.set("spark.sql.catalog.slakes",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.slakes.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS slakes.default")
    spark.sql("""CREATE TABLE slakes.default.src (vector array<float>, document string)
                 USING graft OPTIONS (dim '4', numHashes '2')""")
    spark.sql("""INSERT INTO slakes.default.src (vector, document)
                 VALUES (array(1.0F, 0.0F, 0.0F, 0.0F), 'a'),
                        (array(0.0F, 1.0F, 0.0F, 0.0F), 'b'),
                        (array(0.0F, 0.0F, 1.0F, 0.0F), 'c')""")
    val a = spark.sql("CALL slakes.system.seal(table => 'default.src')")
      .head().getLong(0)
    val rep = tmp() + "/rep"
    spark.sql(s"""CALL slakes.system.clone(table => 'default.src',
                    target_location => '$rep', as_of => $a)""")
    spark.sql("DELETE FROM slakes.default.src WHERE document = 'b'")
    spark.sql("""INSERT INTO slakes.default.src (vector, document)
                 VALUES (array(1.0F, 1.0F, 0.0F, 0.0F), 'd')""")
    val b = spark.sql("CALL slakes.system.seal(table => 'default.src')")
      .head().getLong(0)
    val r = spark.sql(
      s"""CALL slakes.system.sync(replica => '$rep', source => 'default.src',
            from_version => $a, to_version => $b)""").head()
    assert(r.getLong(0) === 1L && r.getLong(1) === 1L)
    assert(spark.read.format("graft").load(rep)
      .select("document").as[String].collect().sorted.toSeq ===
      Seq("a", "c", "d"))
  }
}
