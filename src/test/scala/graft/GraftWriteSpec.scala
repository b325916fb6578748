package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** The DSv2 batch WRITE path (`INSERT INTO`, `df.write.format("graft")
  * .mode("append")`): every SQL-surface write must funnel through the
  * IDENTICAL derive + staged-publish + append-gate path as
  * [[graft.Lake.ingest]] — row parity, routing parity, metadata
  * parity, evolve-extras parity — and the destructive modes must be
  * refused. */
class GraftWriteSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_write_spec").toString

  private val vecs = Seq(
    (Seq(1f, 0f, 0f, 0f), "a"), (Seq(0f, 1f, 0f, 0f), "b"),
    (Seq(0f, 0f, 1f, 0f), "c"), (Seq(0.5f, 0.5f, 0f, 0f), "d"))

  test("df.write.format(graft).mode(append) with a subset schema lands routed, derived rows") {
    val loc = tmp() + "/lake"
    vecs.toDF("vector", "document")
      .write.format("graft").mode("append")
      .option("dim", "4").option("numHashes", "2")
      .save(loc)
    val lake = Lake(spark, LakeConfig(loc, dim = 4, numHashes = 2))
    val got = lake.read()
    assert(got.count() === 4)
    // full derive path ran: uuid ids, timestamp, default metadata, routing
    assert(got.select("id").as[String].collect().forall(_.nonEmpty))
    assert(got.select("metadata").where(size($"metadata") === 0).count() === 0)
    assert(got.where($"timestamp".isNull).count() === 0)
    // routing parity with the Scala API on the same rows
    val twin = Lake(spark, LakeConfig(tmp() + "/twin", dim = 4, numHashes = 2))
    twin.ingest(vecs.toDF("vector", "document"))
    val bySql = got.select("document", "shard").as[(String, Int)].collect().toMap
    val byApi = twin.read().select("document", "shard").as[(String, Int)].collect().toMap
    assert(bySql === byApi)
  }

  test("INSERT INTO ... USING graft with a column list: missing columns derive, rows match the Scala path") {
    val loc = tmp() + "/lake"
    // bootstrap the lake so the sidecar carries dim/hashes
    val lake = Lake(spark, LakeConfig(loc, dim = 4, numHashes = 2))
    lake.ingest(Seq((Seq(1f, 0f, 0f, 0f), "seed")).toDF("vector", "document"))
    spark.sql("DROP TABLE IF EXISTS graft_write_spec_t")
    spark.sql(s"CREATE TABLE graft_write_spec_t USING graft LOCATION '$loc'")
    try {
      spark.sql(
        """INSERT INTO graft_write_spec_t (vector, document)
           VALUES (array(0.0F, 1.0F, 0.0F, 0.0F), 'sql-b'),
                  (array(0.0F, 0.0F, 1.0F, 0.0F), 'sql-c')""")
      val got = lake.read()
      assert(got.count() === 3)
      assert(got.select("document").as[String].collect().toSet ===
        Set("seed", "sql-b", "sql-c"))
      // the SQL-inserted rows carry derived ids/timestamps/metadata
      val sqlRows = got.where($"document".startsWith("sql-"))
      assert(sqlRows.where($"id".isNull || $"timestamp".isNull).count() === 0)
      assert(sqlRows.select("metadata").where(size($"metadata") === 0).count() === 0)
      // and the reads through the SQL table see them
      assert(spark.sql("SELECT count(*) FROM graft_write_spec_t").head().getLong(0) === 3)
    } finally spark.sql("DROP TABLE IF EXISTS graft_write_spec_t")
  }

  test("evolve extras flow through the SQL write; caller-supplied id and timestamp survive") {
    val loc = tmp() + "/lake"
    val lake = Lake(spark, LakeConfig(loc, dim = 4, numHashes = 2))
    lake.ingest(Seq((Seq(1f, 0f, 0f, 0f), "seed")).toDF("vector", "document"))
    lake.evolve(StructType(Seq(StructField("quality", DoubleType))))
    Seq((Seq(0f, 1f, 0f, 0f), "q-doc", 0.75, "my-id"))
      .toDF("vector", "document", "quality", "id")
      .write.format("graft").mode("append").save(loc)
    val got = lake.read().where($"document" === "q-doc")
      .select("quality", "id").collect()
    assert(got.length === 1)
    assert(got.head.getDouble(0) === 0.75)
    assert(got.head.getString(1) === "my-id")
    // pre-evolve row null-fills
    assert(lake.read().where($"document" === "seed" && $"quality".isNull).count() === 1)
  }

  test("destructive modes are refused: overwrite, truncate-style INSERT OVERWRITE, asOf snapshots") {
    val loc = tmp() + "/lake"
    val lake = Lake(spark, LakeConfig(loc, dim = 4, numHashes = 2))
    lake.ingest(vecs.toDF("vector", "document"))
    val df = Seq((Seq(1f, 0f, 0f, 0f), "x")).toDF("vector", "document")
    intercept[Exception] {
      df.write.format("graft").mode("overwrite").save(loc)
    }
    spark.sql("DROP TABLE IF EXISTS graft_write_spec_o")
    spark.sql(s"CREATE TABLE graft_write_spec_o USING graft LOCATION '$loc'")
    try intercept[Exception] {
      spark.sql(
        """INSERT OVERWRITE graft_write_spec_o (vector, document)
           VALUES (array(1.0F, 0.0F, 0.0F, 0.0F), 'x')""")
    } finally spark.sql("DROP TABLE IF EXISTS graft_write_spec_o")
    // nothing was destroyed by the refused writes
    assert(lake.read().count() === 4)
    // a time-travel table is read-only
    val v = lake.history().agg(max("version")).head().getLong(0)
    intercept[Exception] {
      df.write.format("graft").mode("append")
        .option("asOf", v.toString).save(loc)
    }
    assert(lake.read().count() === 4)
  }

  test("concurrent SQL writes admit each other (shared append gate), rows from both land") {
    val loc = tmp() + "/lake"
    val lake = Lake(spark, LakeConfig(loc, dim = 4, numHashes = 2))
    lake.ingest(Seq((Seq(1f, 0f, 0f, 0f), "seed")).toDF("vector", "document"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val writes = (0 until 2).map { w =>
      scala.concurrent.Future {
        (0 until 3).foreach { b =>
          Seq((Seq(0f, 1f, 0f, w.toFloat), s"w$w-b$b"))
            .toDF("vector", "document")
            .write.format("graft").mode("append").save(loc)
        }
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(writes),
      scala.concurrent.duration.Duration(180, "s"))
    pool.shutdown()
    assert(lake.read().count() === 7)
    assert(lake.read().select("document").as[String].collect().toSet ===
      (for (w <- 0 until 2; b <- 0 until 3) yield s"w$w-b$b").toSet + "seed")
    // no stranded locks: maintenance proceeds
    lake.compact()
  }

  test("packed lakes: the format recovers packSignBits from the sidecar; a lesser config cannot write") {
    val loc = tmp() + "/lake"
    val packed = Lake(spark,
      LakeConfig(loc, dim = 4, numHashes = 2, packSignBits = true))
    packed.ingest(Seq((Seq(1f, 0f, -1f, 0f), "a")).toDF("vector", "document"))
    // zero options: the SQL write must reconstruct packSignBits and
    // carry the packed column — a silent un-packed append would
    // null-poison topKCompressed for these rows
    Seq((Seq(0f, 1f, 0f, -1f), "b")).toDF("vector", "document")
      .write.format("graft").mode("append").save(loc)
    val got = packed.read()
    assert(got.count() === 2)
    assert(got.where($"packed".isNull).count() === 0,
      "SQL-written rows must carry the packed sign bits")
    // a Scala session WITHOUT packSignBits is refused on every write
    // and rewrite (its frames would strip the column)
    val lesser = Lake(spark, LakeConfig(loc, dim = 4, numHashes = 2))
    val e1 = intercept[IllegalArgumentException](
      lesser.ingest(Seq((Seq(1f, 1f, 0f, 0f), "c")).toDF("vector", "document")))
    assert(e1.getMessage.contains("packSignBits"))
    intercept[IllegalArgumentException](lesser.compact())
    intercept[IllegalArgumentException](
      lesser.deleteWhere($"document" === "a"))
    // seal/bootstrap re-stamp the sidecar too — a lesser-config stamp
    // would ERASE pack_sign_bits and unlock the stripping writes above
    intercept[IllegalArgumentException](lesser.seal())
    intercept[IllegalArgumentException](lesser.bootstrap())
    assert(packed.read().count() === 2, "refused ops changed nothing")
  }

  test("PQ lakes: SQL writes are refused (codebooks are not reconstructible from a fingerprint)") {
    import graft.operators.Pq
    val dim = 8
    val data = Seq.tabulate(64)(i =>
      (i.toLong, Seq.tabulate(dim)(j => math.sin(i * 31 + j).toFloat)))
      .toDF("id", "vec")
    val model = Pq.round6(Pq.train(data, "vec", "id", dim = dim, m = 4, k = 8, iters = 2))
    val loc = tmp() + "/lake"
    val pq = Lake(spark, LakeConfig(loc, dim = dim, numHashes = 2,
      pqCodebooks = Some(model)))
    pq.ingest(data.select(col("vec").cast("array<float>").as("vector"),
      concat(lit("d"), col("id")).as("document")))
    val e = intercept[Exception] {
      Seq((Seq.fill(dim)(0.1f), "sql")).toDF("vector", "document")
        .write.format("graft").mode("append").save(loc)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("pqCodebooks")))
    assert(pq.read().count() === 64, "refused write landed nothing")
  }

  test("user-keyed lakes: the format recovers the partition key NAME from the sidecar") {
    val loc = tmp() + "/lake"
    val keyed = Lake(spark, LakeConfig(loc, dim = 4, numHashes = 2,
      partitionKey = Some("tenant")))
    keyed.ingest(Seq((Seq(1f, 0f, 0f, 0f), "a", "acme"))
      .toDF("vector", "document", "tenant"))
    // zero options: both the read schema and the write routing must use
    // the REAL key name, not the legacy "key" guess
    val viaFmt = spark.read.format("graft").load(loc)
    assert(viaFmt.columns.contains("tenant"))
    Seq((Seq(0f, 1f, 0f, 0f), "b", "globex"))
      .toDF("vector", "document", "tenant")
      .write.format("graft").mode("append").save(loc)
    assert(keyed.read().select("document", "tenant").as[(String, String)]
      .collect().toMap === Map("a" -> "acme", "b" -> "globex"))
  }

  test("user-keyed lakes: the format recovers the partition key TYPE from the sidecar") {
    val loc = tmp() + "/lake"
    val keyed = Lake(spark, LakeConfig(loc, dim = 4, numHashes = 2,
      partitionKey = Some("region_id"),
      partitionKeyType = org.apache.spark.sql.types.IntegerType))
    keyed.ingest(Seq((Seq(1f, 0f, 0f, 0f), "a", 7))
      .toDF("vector", "document", "region_id"))
    // zero options: the format must serve the key at the Scala API's
    // declared type, not the StringType default — a string-typed
    // shard column here would diverge from keyed.read()'s int
    val viaFmt = spark.read.format("graft").load(loc)
    assert(viaFmt.schema("region_id").dataType ===
      org.apache.spark.sql.types.IntegerType,
      viaFmt.schema.treeString)
    assert(viaFmt.where(col("region_id") === 7).count() === 1L)
    // and the SQL write path routes under the same typed key
    Seq((Seq(0f, 1f, 0f, 0f), "b", 9))
      .toDF("vector", "document", "region_id")
      .write.format("graft").mode("append").save(loc)
    assert(keyed.read().select("document", "region_id").as[(String, Int)]
      .collect().toMap === Map("a" -> 7, "b" -> 9))
  }

  test("config UPGRADES are refused over a lake that holds rows; a bootstrapped empty lake upgrades freely") {
    val loc = tmp() + "/lake"
    val plain = Lake(spark, LakeConfig(loc, dim = 4, numHashes = 2))
    plain.ingest(vecs.toDF("vector", "document"))
    // the REVERSE of the lesser-config refusal: a session DECLARING a
    // compression over rows written without it would stamp the new
    // config into the sidecar as authoritative, null-poisoning every
    // existing row's compressed search AND locking the original config
    // out via the lesser-config rule — refused on write and rewrite
    val upgraded = Lake(spark,
      LakeConfig(loc, dim = 4, numHashes = 2, packSignBits = true))
    val e = intercept[IllegalArgumentException](
      upgraded.ingest(Seq((Seq(1f, 1f, 0f, 0f), "x")).toDF("vector", "document")))
    assert(e.getMessage.contains("packSignBits"))
    assert(e.getMessage.contains("WITHOUT"))
    intercept[IllegalArgumentException](upgraded.compact())
    intercept[IllegalArgumentException](
      upgraded.deleteWhere($"document" === "a"))
    // EVERY sidecar re-stamper refuses, not just row writes: seal and
    // evolve would stamp the upgraded flags just as authoritatively
    intercept[IllegalArgumentException](upgraded.seal())
    intercept[IllegalArgumentException](upgraded.evolve(
      StructType(Seq(StructField("q", DoubleType)))))
    assert(plain.read().count() === 4, "refused ops changed nothing")
    // the original config keeps working after the refusals
    plain.ingest(Seq((Seq(1f, 1f, 1f, 0f), "e")).toDF("vector", "document"))
    assert(plain.read().count() === 5)

    // a DATA-LESS lake may upgrade: CREATE TABLE bootstraps the sidecar
    // under the plain config, but with zero rows there is nothing to
    // poison — the first write defines the layout
    val loc2 = tmp() + "/empty"
    Lake(spark, LakeConfig(loc2, dim = 4, numHashes = 2)).bootstrap()
    val packed = Lake(spark,
      LakeConfig(loc2, dim = 4, numHashes = 2, packSignBits = true))
    packed.ingest(Seq((Seq(1f, 0f, -1f, 0f), "p")).toDF("vector", "document"))
    assert(packed.read().where($"packed".isNull).count() === 0,
      "the upgraded first write carries the packed column")
  }

  test("a declared PQ model over a plain lake with rows is refused (upgrade direction)") {
    import graft.operators.Pq
    val loc = tmp() + "/lake"
    val plain = Lake(spark, LakeConfig(loc, dim = 4, numHashes = 2))
    plain.ingest(vecs.toDF("vector", "document"))
    val data = Seq.tabulate(16)(i =>
      (i.toLong, Seq.tabulate(4)(j => math.sin(i * 7 + j).toFloat)))
      .toDF("id", "vec")
    val model = Pq.round6(Pq.train(data, "vec", "id", dim = 4, m = 2, k = 4, iters = 1))
    val pqSession = Lake(spark, LakeConfig(loc, dim = 4, numHashes = 2,
      pqCodebooks = Some(model)))
    val e = intercept[IllegalArgumentException](
      pqSession.ingest(Seq((Seq(1f, 1f, 0f, 0f), "x")).toDF("vector", "document")))
    assert(e.getMessage.contains("pqCodebooks"))
    assert(plain.read().count() === 4)
  }

  test("a partition key name needing JSON escaping round-trips through the sidecar") {
    // the sidecar stores the key NAME json-escaped; a naive [^"]*
    // capture on the read side would hand back the ESCAPED text (e.g.
    // a doubled backslash) and the format would resolve a column that
    // does not exist
    val key = """te\ant"""
    val loc = tmp() + "/lake"
    val keyed = Lake(spark, LakeConfig(loc, dim = 4, numHashes = 2,
      partitionKey = Some(key)))
    keyed.ingest(Seq((Seq(1f, 0f, 0f, 0f), "a", "acme"))
      .toDF("vector", "document", key))
    // zero options: the format must recover the EXACT key name
    val viaFmt = spark.read.format("graft").load(loc)
    assert(viaFmt.columns.contains(key), s"got ${viaFmt.columns.mkString(",")}")
    Seq((Seq(0f, 1f, 0f, 0f), "b", "globex"))
      .toDF("vector", "document", key)
      .write.format("graft").mode("append").save(loc)
    assert(keyed.read().select(col("document"), col(s"`$key`"))
      .as[(String, String)].collect().toMap ===
      Map("a" -> "acme", "b" -> "globex"))
  }

  test("a null vector is refused per-row by the write, loudly") {
    val loc = tmp() + "/lake"
    val lake = Lake(spark, LakeConfig(loc, dim = 4, numHashes = 2))
    lake.ingest(Seq((Seq(1f, 0f, 0f, 0f), "seed")).toDF("vector", "document"))
    val e = intercept[Exception] {
      Seq((None: Option[Seq[Float]], "bad"))
        .toDF("vector", "document")
        .write.format("graft").mode("append").save(loc)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("`vector` is null")))
    assert(lake.read().count() === 1, "refused write published nothing")
    // wrong dimension is refused per-row too: a truncated dot product
    // would otherwise route the row and poison every later distance
    val e2 = intercept[Exception] {
      Seq((Seq(1f, 0f), "short"))
        .toDF("vector", "document")
        .write.format("graft").mode("append").save(loc)
    }
    assert(messages(e2).exists(_.contains("does not match the lake's dim")))
    assert(lake.read().count() === 1)
  }
}
