#!/usr/bin/env python3
"""PySpark-only smoke of the engine's SQL surface — proves the claim
that a user who never writes a line of Scala can run the whole lake
lifecycle: CREATE (catalog), INSERT, SELECT with routed-kNN pruning,
ALTER ADD COLUMNS, DELETE, introspection views, streaming sink +
change feed are exercised elsewhere (Scala specs); this drives the
batch surface from Python.

Run from the repo root (uses the compiled classes + the local Spark):

    sbt compile && python3 tools/pyspark_smoke.py
"""
import shutil
import sys
import tempfile

from pyspark.sql import SparkSession

classes = "target/scala-2.13/classes"
wh = tempfile.mkdtemp(prefix="graft_pysmoke_wh")
spark = (
    SparkSession.builder.master("local[4]")
    .appName("graft-pyspark-smoke")
    .config("spark.driver.extraClassPath", classes)
    .config("spark.executor.extraClassPath", classes)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.catalog.lakes", "graft.sources.GraftCatalog")
    .config("spark.sql.catalog.lakes.warehouse", wh)
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

ok = True


def check(name, cond):
    global ok
    print(("OK   " if cond else "FAIL ") + name)
    ok = ok and cond


spark.sql("CREATE NAMESPACE IF NOT EXISTS lakes.default")
spark.sql("DROP TABLE IF EXISTS lakes.default.pysmoke")
spark.sql(
    """CREATE TABLE lakes.default.pysmoke
         (vector array<float>, document string, label int)
       USING graft OPTIONS (dim '4', numHashes '2')"""
)
spark.sql(
    """INSERT INTO lakes.default.pysmoke (vector, document, label) VALUES
         (array(1.0F, 0.0F, 0.0F, 0.0F), 'py-a', 1),
         (array(0.0F, 1.0F, 0.0F, 0.0F), 'py-b', 2),
         (array(0.0F, 0.0F, 1.0F, 0.0F), 'py-c', 3)"""
)
check("insert -> 3 rows", spark.sql(
    "SELECT count(*) c FROM lakes.default.pysmoke").head().c == 3)
check("derive ran (ids, timestamps, shards non-null)", spark.sql(
    """SELECT count(*) c FROM lakes.default.pysmoke
       WHERE id IS NULL OR timestamp IS NULL OR shard IS NULL"""
).head().c == 0)

spark.sql("ALTER TABLE lakes.default.pysmoke ADD COLUMNS (quality double)")
spark.sql(
    """INSERT INTO lakes.default.pysmoke (vector, document, label, quality)
       VALUES (array(0.5F, 0.5F, 0.0F, 0.0F), 'py-d', 4, 0.9D)"""
)
check("evolved column round-trips", spark.sql(
    "SELECT quality FROM lakes.default.pysmoke WHERE document = 'py-d'"
).head().quality == 0.9)

path = f"{wh}/default/pysmoke"
df = spark.read.format("graft").load(path)
check("path read sees the catalog's rows", df.count() == 4)
check(
    "format read serves evolved + canonical columns",
    {"id", "vector", "document", "metadata", "timestamp", "shard",
     "label", "quality"} <= set(df.columns),
)

spark.sql("DELETE FROM lakes.default.pysmoke WHERE document = 'py-b'")
check("DELETE FROM removed exactly one row", spark.sql(
    "SELECT count(*) c FROM lakes.default.pysmoke").head().c == 3)

# maintenance from SQL: the stored procedures under system
rep = spark.sql(
    "CALL lakes.system.maintain(table => 'default.pysmoke')").head()
check("CALL maintain returns the policy report",
      rep.compacted_shards >= 0 and rep.vacuum_swept >= 0)
check("SHOW PROCEDURES lists the maintenance surface", {
    "maintain", "compact", "vacuum", "repair", "seal"
} <= {r[-1] for r in spark.sql("SHOW PROCEDURES IN lakes.system").collect()})
sealed = spark.sql(
    "CALL lakes.system.seal(table => 'default.pysmoke')").head().version
check("CALL seal commits a version", sealed > 0)

hist = spark.read.format("graft").option("view", "history").load(path)
check("history view readable, >= 2 versions", hist.count() >= 2)
audit = spark.read.format("graft").option("view", "validate").load(path)
row = audit.head()
check("validate view: no misroutes, no dup ids",
      row.misrouted == 0 and row.dup_ids == 0)

# replication from SQL: CALL clone forks a replica at the seal, the
# source keeps mutating, CALL sync advances the replica by the netted
# change feed — the whole loop without a line of Scala
rep_path = f"{wh}/pysmoke_replica"
spark.sql(
    f"""CALL lakes.system.clone(table => 'default.pysmoke',
          target_location => '{rep_path}', as_of => {sealed})"""
)
spark.sql("DELETE FROM lakes.default.pysmoke WHERE document = 'py-c'")
spark.sql(
    """INSERT INTO lakes.default.pysmoke (vector, document, label)
       VALUES (array(0.0F, 0.0F, 0.0F, 1.0F), 'py-e', 5)"""
)
sealed2 = spark.sql(
    "CALL lakes.system.seal(table => 'default.pysmoke')").head().version
sync = spark.sql(
    f"""CALL lakes.system.sync(replica => '{rep_path}',
          source => 'default.pysmoke',
          from_version => {sealed}, to_version => {sealed2})"""
).head()
check("CALL sync applied the netted delta", sync.deleted == 1
      and sync.inserted == 1)
check(
    "replica equals the mutated source",
    sorted(r.document for r in spark.read.format("graft")
           .load(rep_path).select("document").collect())
    == sorted(r.document for r in
              spark.sql("SELECT document FROM lakes.default.pysmoke")
              .collect()),
)

# row-level DML: UPDATE rewrites in place, MERGE upserts through the
# delta path — the full warehouse-DML story from Python
spark.sql("UPDATE lakes.default.pysmoke SET label = 99 WHERE document = 'py-e'")
check("UPDATE SET landed", spark.sql(
    "SELECT label FROM lakes.default.pysmoke WHERE document = 'py-e'")
    .head()[0] == 99)
spark.sql("""
    MERGE INTO lakes.default.pysmoke t
    USING (SELECT 'py-e' AS key, 7 AS lab
           UNION ALL SELECT 'py-f', 8) s
    ON t.document = s.key
    WHEN MATCHED THEN UPDATE SET label = s.lab
    WHEN NOT MATCHED THEN
      INSERT (vector, document, label)
      VALUES (array(0.5F, 0.5F, 0.0F, 0.0F), s.key, s.lab)
""")
check("MERGE updated and inserted", sorted(
    (r.document, r.label) for r in spark.sql(
        "SELECT document, label FROM lakes.default.pysmoke "
        "WHERE document IN ('py-e', 'py-f')").collect())
    == [("py-e", 7), ("py-f", 8)])
spark.sql("DELETE FROM lakes.default.pysmoke WHERE document = 'py-f'")

# anti-entropy from SQL: mutate the SOURCE with no seal (nothing for the
# feed to replay), then CALL heal rewrites only the convicted shards
spark.sql("DELETE FROM lakes.default.pysmoke WHERE document = 'py-e'")
check(
    "SQL time travel: VERSION AS OF still serves the pre-delete seal",
    spark.sql(f"""SELECT count(*) FROM lakes.default.pysmoke
                  VERSION AS OF {sealed2}""").head()[0]
    == spark.sql("SELECT count(*) FROM lakes.default.pysmoke").head()[0] + 1,
)
diff = spark.sql(
    f"""CALL lakes.system.diff(replica => '{rep_path}',
          source => 'default.pysmoke')"""
).head()
check("CALL diff convicts the divergence", diff.diverged >= 1)
heal = spark.sql(
    f"""CALL lakes.system.heal(replica => '{rep_path}',
          source => 'default.pysmoke')"""
).head()
check("CALL heal repaired the diverged shards", heal.shards_repaired >= 1)
check(
    "healed replica equals the source again",
    sorted(r.document for r in spark.read.format("graft")
           .load(rep_path).select("document").collect())
    == sorted(r.document for r in
              spark.sql("SELECT document FROM lakes.default.pysmoke")
              .collect()),
)
heal2 = spark.sql(
    f"""CALL lakes.system.heal(replica => '{rep_path}',
          source => 'default.pysmoke')"""
).head()
check("a second CALL heal is a no-op",
      heal2.shards_repaired == 0 and heal2.rows_rewritten == 0)

# derived feature table from SQL: CALL derive builds, a second CALL
# refreshes incrementally, and the registered LOCATION table joins
# co-located by (shard, id)
dloc = wh + "/pysmoke_feat"
drv = spark.sql(
    f"""CALL lakes.system.derive(table => 'default.pysmoke',
          target => '{dloc}',
          transform => 'SELECT id, shard, length(document) AS doc_len FROM __base__')"""
).head()
check("CALL derive built the feature table", drv.generation == 1)
spark.sql(
    f"CREATE TABLE lakes.default.pysmoke_feat USING graft LOCATION '{dloc}'")
n_base = spark.sql("SELECT count(*) c FROM lakes.default.pysmoke").head().c
check("derived join serves every base row with correct features", spark.sql(
    """SELECT count(*) c FROM lakes.default.pysmoke b
       JOIN lakes.default.pysmoke_feat f
         ON b.shard = f.shard AND b.id = f.id
       WHERE f.doc_len = length(b.document)""").head().c == n_base)
spark.sql("INSERT INTO lakes.default.pysmoke (vector, document) VALUES "
          "(array(CAST(0.5 AS FLOAT), CAST(9 AS FLOAT), CAST(9 AS FLOAT), "
          "CAST(1 AS FLOAT)), 'derive-me')")
drv2 = spark.sql(
    f"""CALL lakes.system.derive(table => 'default.pysmoke',
          target => '{dloc}',
          transform => 'SELECT id, shard, length(document) AS doc_len FROM __base__')"""
).head()
check("a second CALL derive refreshes incrementally",
      drv2.generation == 2 and drv2.base_version > drv.base_version)
check("refreshed join covers the new row", spark.sql(
    """SELECT count(*) c FROM lakes.default.pysmoke b
       JOIN lakes.default.pysmoke_feat f
         ON b.shard = f.shard AND b.id = f.id
       WHERE f.doc_len = length(b.document)""").head().c == n_base + 1)

# incremental reshard from SQL: grow the routing width, count preserved,
# the table reads back at the new width (resume semantics: a second
# identical CALL is a no-op with 0 pending)
pre_n = spark.sql("SELECT count(*) c FROM lakes.default.pysmoke").head().c
rs = spark.sql(
    "CALL lakes.system.reshard(table => 'default.pysmoke', num_hashes => 4)"
).head()
check("CALL reshard completed to 16 shards",
      rs.num_shards == 16 and rs.pending_dirs == 0)
check("resharded table reads back with every row", spark.sql(
    "SELECT count(*) c FROM lakes.default.pysmoke").head().c == pre_n)
rs2 = spark.sql(
    "CALL lakes.system.reshard(table => 'default.pysmoke', num_hashes => 4)"
).head()
check("a second CALL reshard is a no-op",
      rs2.num_shards == 16 and rs2.pending_dirs == 0)

spark.sql("DROP TABLE lakes.default.pysmoke")
check("DROP removed the managed lake", spark.sql(
    "SHOW TABLES IN lakes.default").filter("tableName = 'pysmoke'").count() == 0)

spark.stop()
shutil.rmtree(wh, ignore_errors=True)
print("ALL OK" if ok else "FAILURES")
sys.exit(0 if ok else 1)
