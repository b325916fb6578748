package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The SQL catalog ([[graft.sources.GraftCatalog]]): the full lake
  * lifecycle driven from `spark.sql` ONLY — CREATE (managed, external,
  * adopt), INSERT, SELECT, ALTER ADD COLUMNS (= evolve), writeTo,
  * SHOW TABLES, DROP — plus the refusals (partitioning, rename,
  * destructive modes, missing dim). */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft_catalog_wh").toString
    spark.conf.set("spark.sql.catalog.lakes",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.lakes.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakes.default")
    w
  }

  private def sql(s: String) = spark.sql(s)

  test("managed lifecycle: CREATE with extras -> INSERT -> SELECT -> ALTER ADD COLUMNS -> INSERT -> DROP") {
    warehouse
    sql("DROP TABLE IF EXISTS lakes.default.corpus")
    sql("""CREATE TABLE lakes.default.corpus
             (vector array<float>, document string, label int)
           USING graft OPTIONS (dim '4', numHashes '2')""")
    // the managed lake exists on disk, empty but bootstrapped
    assert(sql("SELECT * FROM lakes.default.corpus").count() === 0)
    assert(sql("SHOW TABLES IN lakes.default").collect()
      .map(_.getString(1)).contains("corpus"))

    sql("""INSERT INTO lakes.default.corpus (vector, document, label)
           VALUES (array(1.0F, 0.0F, 0.0F, 0.0F), 'a', 7),
                  (array(0.0F, 1.0F, 0.0F, 0.0F), 'b', 8)""")
    val got = sql("""SELECT document, label FROM lakes.default.corpus
                     ORDER BY document""").collect()
    assert(got.map(r => (r.getString(0), r.getInt(1))).toSeq ===
      Seq(("a", 7), ("b", 8)))
    // derive path ran (ids, timestamps, routing)
    assert(sql("""SELECT count(*) FROM lakes.default.corpus
                  WHERE id IS NULL OR timestamp IS NULL OR shard IS NULL""")
      .head().getLong(0) === 0)

    // ALTER ADD COLUMNS = Lake.evolve: sidecar commit, no rewrite
    sql("ALTER TABLE lakes.default.corpus ADD COLUMNS (quality double)")
    sql("""INSERT INTO lakes.default.corpus (vector, document, label, quality)
           VALUES (array(0.0F, 0.0F, 1.0F, 0.0F), 'c', 9, 0.5D)""")
    val q = sql("""SELECT document, quality FROM lakes.default.corpus
                   ORDER BY document""").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(q.toSeq === Seq("a" -> None, "b" -> None, "c" -> Some(0.5)))

    // DROP of a managed table removes the lake directory
    sql("DROP TABLE lakes.default.corpus")
    assert(!sql("SHOW TABLES IN lakes.default").collect()
      .map(_.getString(1)).contains("corpus"))
    assert(!new java.io.File(s"$warehouse/default/corpus").exists())
  }

  test("writeTo(...).append() lands through the same routed ingest") {
    warehouse
    sql("DROP TABLE IF EXISTS lakes.default.wt")
    sql("""CREATE TABLE lakes.default.wt (vector array<float>, document string)
           USING graft OPTIONS (dim '4', numHashes '2')""")
    Seq((Seq(1f, 0f, 0f, 0f), "w1"), (Seq(0f, 1f, 0f, 0f), "w2"))
      .toDF("vector", "document")
      .writeTo("lakes.default.wt").append()
    assert(sql("SELECT count(*) FROM lakes.default.wt").head().getLong(0) === 2)
    // routing parity with the Scala API
    val lake = Lake(spark,
      LakeConfig(s"$warehouse/default/wt", dim = 4, numHashes = 2))
    val twin = Lake(spark, LakeConfig(
      Files.createTempDirectory("wt_twin").toString + "/l", dim = 4, numHashes = 2))
    twin.ingest(Seq((Seq(1f, 0f, 0f, 0f), "w1"), (Seq(0f, 1f, 0f, 0f), "w2"))
      .toDF("vector", "document"))
    assert(lake.read().select("document", "shard").as[(String, Int)].collect().toMap ===
      twin.read().select("document", "shard").as[(String, Int)].collect().toMap)
    sql("DROP TABLE lakes.default.wt")
  }

  test("external table: CREATE ... LOCATION adopts an existing lake; DROP forgets, never deletes") {
    warehouse
    val loc = Files.createTempDirectory("graft_cat_ext").toString + "/lake"
    val lake = Lake(spark, LakeConfig(loc, dim = 4, numHashes = 2))
    lake.ingest(Seq((Seq(1f, 0f, 0f, 0f), "pre")).toDF("vector", "document"))
    sql("DROP TABLE IF EXISTS lakes.default.ext")
    sql(s"CREATE TABLE lakes.default.ext USING graft LOCATION '$loc'")
    assert(sql("SELECT document FROM lakes.default.ext").head().getString(0) === "pre")
    sql("""INSERT INTO lakes.default.ext (vector, document)
           VALUES (array(0.0F, 1.0F, 0.0F, 0.0F), 'post')""")
    assert(lake.read().count() === 2, "catalog insert visible to the Scala API")
    sql("DROP TABLE lakes.default.ext")
    assert(lake.read().count() === 2, "DROP of an external table keeps the lake")
    // adopting with a column list is refused (the sidecar is the schema)
    val e = intercept[IllegalArgumentException](
      sql(s"CREATE TABLE lakes.default.ext2 (vector array<float>) " +
        s"USING graft LOCATION '$loc'"))
    assert(e.getMessage.contains("sidecar"))
  }

  test("refusals: PARTITIONED BY, missing dim, canonical type conflict, RENAME, non-add ALTER") {
    warehouse
    intercept[Exception](sql(
      """CREATE TABLE lakes.default.r1 (vector array<float>, part int)
         USING graft PARTITIONED BY (part) OPTIONS (dim '4')"""))
    intercept[Exception](sql(
      "CREATE TABLE lakes.default.r2 (vector array<float>) USING graft"))
    intercept[Exception](sql(
      """CREATE TABLE lakes.default.r3 (vector array<int>)
         USING graft OPTIONS (dim '4')"""))
    sql("DROP TABLE IF EXISTS lakes.default.r4")
    sql("""CREATE TABLE lakes.default.r4 (vector array<float>)
           USING graft OPTIONS (dim '4', numHashes '2')""")
    intercept[Exception](sql(
      "ALTER TABLE lakes.default.r4 RENAME TO lakes.default.r5"))
    intercept[Exception](sql(
      "ALTER TABLE lakes.default.r4 DROP COLUMN document"))
    // reserved names bubble up from evolve as SQL errors
    val e = intercept[Exception](sql(
      "ALTER TABLE lakes.default.r4 ADD COLUMNS (dist double)"))
    assert(e.getMessage.contains("reserved"))
    sql("DROP TABLE lakes.default.r4")
  }

  test("DELETE FROM and TRUNCATE map onto the transactional deleteWhere; snapshots and maps refuse") {
    warehouse
    sql("DROP TABLE IF EXISTS lakes.default.del")
    sql("""CREATE TABLE lakes.default.del (vector array<float>, document string)
           USING graft OPTIONS (dim '4', numHashes '2')""")
    sql("""INSERT INTO lakes.default.del (vector, document, id)
           VALUES (array(1.0F, 0.0F, 0.0F, 0.0F), 'a', 'id-a'),
                  (array(0.0F, 1.0F, 0.0F, 0.0F), 'b', 'id-b'),
                  (array(0.0F, 0.0F, 1.0F, 0.0F), 'c', 'id-c')""")
    sql("DELETE FROM lakes.default.del WHERE id = 'id-b'")
    assert(sql("SELECT document FROM lakes.default.del ORDER BY document")
      .collect().map(_.getString(0)).toSeq === Seq("a", "c"))
    // conjunctions, IN lists, string predicates all translate
    sql("DELETE FROM lakes.default.del WHERE document LIKE 'a%' AND id IN ('id-a', 'id-x')")
    assert(sql("SELECT count(*) FROM lakes.default.del").head().getLong(0) === 1)
    // the delete ran through the lake's rewrite path: the Scala API
    // sees the same live set, and history kept the pre-delete version
    val lake = Lake(spark,
      LakeConfig(s"$warehouse/default/del", dim = 4, numHashes = 2))
    assert(lake.read().count() === 1)
    assert(lake.history().count() >= 2)
    // TRUNCATE = delete-all through the identical path
    sql("TRUNCATE TABLE lakes.default.del")
    assert(sql("SELECT count(*) FROM lakes.default.del").head().getLong(0) === 0)
    assert(lake.read().count() === 0)
    sql("DROP TABLE lakes.default.del")
  }

  test("namespaces: CREATE/SHOW/DROP, non-empty refusal without CASCADE, tables listed per namespace") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakes.nsx")
    assert(sql("SHOW NAMESPACES IN lakes").collect()
      .map(_.getString(0)).contains("nsx"))
    sql("""CREATE TABLE lakes.nsx.t1 (vector array<float>)
           USING graft OPTIONS (dim '4', numHashes '2')""")
    assert(sql("SHOW TABLES IN lakes.nsx").collect()
      .map(_.getString(1)).toSeq === Seq("t1"))
    // dropping a populated namespace without CASCADE refuses
    intercept[Exception](sql("DROP NAMESPACE lakes.nsx"))
    assert(sql("SHOW TABLES IN lakes.nsx").count() === 1, "refusal dropped nothing")
    sql("DROP NAMESPACE lakes.nsx CASCADE")
    assert(!sql("SHOW NAMESPACES IN lakes").collect()
      .map(_.getString(0)).contains("nsx"))
  }

  test("the evolve fuzz op is reachable via ALTER: extras survive maintenance driven from SQL reads") {
    warehouse
    sql("DROP TABLE IF EXISTS lakes.default.ev")
    sql("""CREATE TABLE lakes.default.ev (vector array<float>, document string)
           USING graft OPTIONS (dim '4', numHashes '2')""")
    sql("""INSERT INTO lakes.default.ev (vector, document)
           VALUES (array(1.0F, 0.0F, 0.0F, 0.0F), 'm1')""")
    sql("ALTER TABLE lakes.default.ev ADD COLUMNS (score double, tag string)")
    sql("""INSERT INTO lakes.default.ev (vector, document, score, tag)
           VALUES (array(0.0F, 1.0F, 0.0F, 0.0F), 'm2', 1.5D, 't')""")
    // maintenance through the Scala API; the SQL read resolves the
    // post-compact live set with both extras intact
    val lake = Lake(spark,
      LakeConfig(s"$warehouse/default/ev", dim = 4, numHashes = 2))
    lake.compact()
    val rows = sql("""SELECT document, score, tag FROM lakes.default.ev
                      ORDER BY document""").collect()
    assert(rows.length === 2)
    assert(rows(0).getString(0) === "m1" && rows(0).isNullAt(1) && rows(0).isNullAt(2))
    assert(rows(1).getString(0) === "m2" && rows(1).getDouble(1) === 1.5 &&
      rows(1).getString(2) === "t")
    sql("DROP TABLE lakes.default.ev")
  }

  test("CTAS: a full-arity projection lands derived rows; a subset projection fails Spark's arity check with NO orphan") {
    warehouse
    import spark.implicits._
    Seq((Seq(1f, 0f, 0f, 0f), "a"), (Seq(0f, 1f, 0f, 0f), "b"))
      .toDF("vector", "document").createOrReplaceTempView("cat_ctas_src")
    // CTAS writes BY POSITION, so the query must supply every canonical
    // column — null-projected derived columns take their defaults
    // (uuid ids, routed shards) through the same write path as INSERT
    sql("DROP TABLE IF EXISTS lakes.default.ctas_ok")
    sql("""CREATE TABLE lakes.default.ctas_ok USING graft
             OPTIONS (dim '4', numHashes '2')
           AS SELECT CAST(null AS STRING) id, vector,
                     CAST(null AS MAP<STRING,STRING>) metadata, document,
                     CAST(null AS TIMESTAMP) timestamp,
                     CAST(null AS INT) shard
           FROM cat_ctas_src""")
    assert(sql("""SELECT count(*) FROM lakes.default.ctas_ok
                  WHERE id IS NULL OR shard IS NULL OR timestamp IS NULL""")
      .head().getLong(0) === 0, "CTAS rows must derive like any write")
    assert(sql("SELECT document FROM lakes.default.ctas_ok")
      .as[String].collect().sorted.toSeq === Seq("a", "b"))
    sql("DROP TABLE lakes.default.ctas_ok")
    // the ergonomic subset shape is positional-arity-refused by Spark;
    // the half-created table must NOT linger (non-atomic CTAS cleanup)
    val e = intercept[Exception](
      sql("""CREATE TABLE lakes.default.ctas_bad USING graft
               OPTIONS (dim '4', numHashes '2')
             AS SELECT vector, document FROM cat_ctas_src"""))
    assert(e.getMessage.contains("not enough data columns"), e.getMessage)
    assert(sql("SHOW TABLES IN lakes.default").collect()
      .forall(_.getString(1) != "ctas_bad"), "orphan table after failed CTAS")
    // the supported ergonomic spelling: CREATE + column-list INSERT
    sql("""CREATE TABLE lakes.default.ctas_two (vector array<float>, document string)
           USING graft OPTIONS (dim '4', numHashes '2')""")
    sql("""INSERT INTO lakes.default.ctas_two (vector, document)
           SELECT vector, document FROM cat_ctas_src""")
    assert(sql("SELECT count(*) FROM lakes.default.ctas_two")
      .head().getLong(0) === 2)
    sql("DROP TABLE lakes.default.ctas_two")
  }

  test("SQL time travel: VERSION AS OF and TIMESTAMP AS OF serve sealed snapshots; vacuumed and predating cuts fail loudly") {
    warehouse
    sql("DROP TABLE IF EXISTS lakes.default.tt")
    sql("""CREATE TABLE lakes.default.tt (vector array<float>, document string)
           USING graft OPTIONS (dim '4', numHashes '2')""")
    sql("""INSERT INTO lakes.default.tt (vector, document)
           VALUES (array(1.0F, 0.0F, 0.0F, 0.0F), 'a'),
                  (array(0.0F, 1.0F, 0.0F, 0.0F), 'b')""")
    val v1 = sql("CALL lakes.system.seal(table => 'default.tt')")
      .head().getLong(0)
    sql("DELETE FROM lakes.default.tt WHERE document = 'b'")
    sql("""INSERT INTO lakes.default.tt (vector, document)
           VALUES (array(0.0F, 0.0F, 1.0F, 0.0F), 'c')""")
    sql("CALL lakes.system.seal(table => 'default.tt')")

    def docs(suffix: String): Seq[String] =
      sql(s"SELECT document FROM lakes.default.tt $suffix")
        .as[String].collect().sorted.toSeq
    assert(docs("") === Seq("a", "c"))
    assert(docs(s"VERSION AS OF $v1") === Seq("a", "b"))

    // TIMESTAMP AS OF: the v1 seal's own last_update stamp resolves to
    // v1 (at-or-before semantics); a far-future instant serves current
    val loc = Lake(spark, LakeConfig(s"$warehouse/default/tt",
      dim = 4, numHashes = 2))
    val stampV1 = loc.history().where(col("version") === v1)
      .select("last_update").as[String].head()
    assert(docs(s"TIMESTAMP AS OF '$stampV1'") === Seq("a", "b"))
    assert(docs("TIMESTAMP AS OF '2999-01-01'") === Seq("a", "c"))

    // a snapshot table is read-only through SQL too
    val roErr = intercept[Exception](
      sql(s"""INSERT INTO lakes.default.tt VERSION AS OF $v1
              (vector, document) VALUES (array(1F,1F,1F,1F), 'x')"""))
    assert(roErr.getMessage != null)

    // predating cut: loud refusal, not an empty guess
    val early = intercept[IllegalArgumentException](
      sql("SELECT * FROM lakes.default.tt TIMESTAMP AS OF '1990-01-01'")
        .collect())
    assert(early.getMessage.contains("predates"))

    // vacuum retires v1 -> VERSION AS OF v1 fails by name
    sql(s"CALL lakes.system.vacuum(table => 'default.tt')")
    val gone = intercept[Exception](docs(s"VERSION AS OF $v1"))
    assert(gone.getMessage.contains(v1.toString))
    sql("DROP TABLE lakes.default.tt")
  }
}
