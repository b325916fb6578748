package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** STORAGE-PARTITIONED JOINS through the `graft` format: with the
  * session opted into DSv2 bucketing, two shard-aligned lakes (a
  * source and its clone/replica — the replication-era comparison
  * shape) join on the shard key with ZERO shuffle on either side,
  * because [[graft.sources.GraftRuntimeScan]] reports
  * `KeyGroupedPartitioning(shard)` and re-plans one keyed file
  * partition per live directory.
  *
  * The tests force the regime where the plan shape matters: file
  * split sizes small enough that every scan is MULTI-partition (a
  * toy-sized lake otherwise collapses to one split, whose
  * SinglePartition output satisfies any distribution and makes every
  * "no shuffle" assertion vacuous) and broadcast joins off (a
  * broadcast side also needs no shuffle — the stock escape hatch SPJ
  * exists to beat when BOTH sides are 100 TB facts). Every test pins
  * the executed plan AND result equality with the stock shuffled
  * run — the plan may never buy speed with wrong rows. */
class GraftSpjSpec extends SparkSpec {
  import spark.implicits._

  private def rows(n: Int) =
    (0 until n).map { i =>
      (s"r-$i", Seq(math.sin(i * 3).toFloat, math.cos(i * 7).toFloat,
        (i % 5 - 2).toFloat / 3), s"doc $i")
    }.toDF("id", "vector", "document")

  private def fmt(lake: Lake): DataFrame =
    spark.read.format("graft").load(lake.cfg.location)

  private def shuffles(p: SparkPlan): Seq[ShuffleExchangeExec] =
    p.collect {
      case s: ShuffleExchangeExec => Seq(s)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        shuffles(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        shuffles(q.plan)
    }.flatten

  private def graftScans(p: SparkPlan): Seq[BatchScanExec] =
    p.collect {
      case b: BatchScanExec => Seq(b)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        graftScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        graftScans(q.plan)
    }.flatten.filter(_.scan.getClass.getName.contains("GraftRuntimeScan"))

  /** Both-facts-huge regime: multi-split scans, no broadcast escape. */
  private val factRegime = Seq(
    "spark.sql.files.maxPartitionBytes" -> "16384",
    "spark.sql.files.openCostInBytes" -> "16384",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  private val spjConfs = Seq(
    "spark.graft.spj" -> "true",
    "spark.sql.sources.v2.bucketing.enabled" -> "true",
    "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true")

  /** Run `body` under `confs`, restoring previous values after. */
  private def withConfs[T](confs: Seq[(String, String)])(body: => T): T = {
    val prev = confs.map { case (k, _) =>
      k -> (try Some(spark.conf.get(k)) catch { case _: Exception => None })
    }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** A source lake and a mutated clone — shard-aligned by
    * construction (cloneTo carries the hyperplane config), with the
    * clone's live set diverged by a row-level delete so the join has
    * something real to measure. */
  private lazy val (src, rep) = {
    val dir = Files.createTempDirectory("graft_spj").toString
    val a = Lake(spark, LakeConfig(s"$dir/src", dim = 3, numHashes = 4))
    a.ingest(rows(4000))
    val b = a.cloneTo(s"$dir/rep")
    b.deleteWhere(col("id").endsWith("7"))
    (a, b)
  }

  test("per-shard profile comparison joins with ZERO shuffle under SPJ") {
    def compared() =
      fmt(src).groupBy("shard").agg(count(lit(1)).as("src_cnt"))
        .join(fmt(rep).groupBy("shard").agg(count(lit(1)).as("rep_cnt")),
          Seq("shard"))
        .where(col("src_cnt") =!= col("rep_cnt"))
    def run(df: DataFrame) = df.collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2))).toSet

    val (stock, stockShuffles) = withConfs(factRegime) {
      val ctl = compared()
      val res = run(ctl)
      (res, shuffles(ctl.queryExecution.executedPlan).size)
    }
    assert(stock.nonEmpty, "the delete must diverge at least one shard")
    // the regime is real: stock mode pays exchanges for both
    // aggregates (and the join) on multi-split scans
    assert(stockShuffles > 0, "control run must shuffle")

    withConfs(factRegime ++ spjConfs) {
      val df = compared()
      assert(run(df) === stock, "SPJ result must equal the shuffled result")
      val plan = df.queryExecution.executedPlan
      assert(graftScans(plan).size === 2, plan.toString.take(1500))
      // the whole point: groupBy(shard) AND the join both ride the
      // storage partitioning — not one exchange in the executed plan
      assert(shuffles(plan).isEmpty,
        s"expected a shuffle-free plan, got:\n${plan.toString.take(2000)}")
    }
  }

  test("row-level replica diff on (shard, id) joins shuffle-free with join keys ⊇ partition keys") {
    def diff() =
      fmt(src).select("shard", "id")
        .join(fmt(rep).select("shard", "id"), Seq("shard", "id"), "left_anti")

    val stock = withConfs(factRegime) {
      val ctl = diff()
      val res = ctl.collect().map(_.getString(1)).toSet
      assert(shuffles(ctl.queryExecution.executedPlan).nonEmpty,
        "control anti-join must shuffle")
      res
    }
    assert(stock.nonEmpty && stock.forall(_.endsWith("7")),
      s"anti-join must surface exactly the deleted ids, got ${stock.take(5)}")

    // join keys (shard, id) ⊃ partition keys (shard): Spark only
    // treats the sides as co-partitioned when told that clustering on
    // a subset of the join keys is acceptable
    withConfs(factRegime ++ spjConfs :+
      ("spark.sql.requireAllClusterKeysForCoPartition" -> "false")) {
      val df = diff()
      assert(df.collect().map(_.getString(1)).toSet === stock)
      val plan = df.queryExecution.executedPlan
      assert(graftScans(plan).size === 2, plan.toString.take(1500))
      assert(shuffles(plan).isEmpty,
        s"expected a shuffle-free anti-join, got:\n${plan.toString.take(2000)}")
    }
  }

  test("diffStats: per-shard replica audit rides SPJ shuffle-free and catches count-neutral divergence") {
    val dir = Files.createTempDirectory("graft_spj_diff").toString
    val a = Lake(spark, LakeConfig(s"$dir/src", dim = 3, numHashes = 4))
    a.ingest(rows(2000))
    val b = a.cloneTo(s"$dir/rep")

    // a fresh clone is fully in sync
    val clean = a.diffStats(b)
    val cleanRows = clean.collect()
    assert(cleanRows.nonEmpty && cleanRows.forall(_.getBoolean(3)),
      "fresh clone must be in_sync on every shard")
    assert(cleanRows.map(r => (r.getLong(1), r.getLong(2))).forall(p => p._1 == p._2))
    // the whole audit — two scans, two per-shard aggregates, the
    // join — executes without ONE exchange (the SPJ shape end to end;
    // spj is the API's own per-read option, no session conf needed)
    assert(shuffles(clean.queryExecution.executedPlan).isEmpty,
      clean.queryExecution.executedPlan.toString.take(2000))

    // a COUNT-NEUTRAL divergence: same id, same vector (same shard),
    // document swapped — counts agree everywhere, the content
    // fingerprint must still convict exactly the mutated row's shard
    val victim = b.read().where(col("id") === "r-42")
      .select(col("vector"), lit("tampered").as("document"), col("id"))
    b.upsert(victim)
    val shard42 = a.read().where(col("id") === "r-42")
      .select("shard").collect().head.getInt(0)
    val audited = a.diffStats(b).collect()
    assert(audited.forall(r => r.getLong(1) == r.getLong(2)),
      "the tamper must be count-neutral")
    val outOfSync = audited.filterNot(_.getBoolean(3)).map(_.getInt(0)).toSet
    assert(outOfSync === Set(shard42),
      s"expected exactly shard $shard42 convicted, got $outOfSync")
  }

  test("a PLAIN read never regroups to one-task-per-shard: SPJ stays a graft-level opt-in") {
    // Spark's own v2-bucketing gate defaults TRUE on this line — if
    // the scan keyed off it, every plain format read would collapse
    // to |shards| tasks. Pin that without the graft opt-in the scan
    // keeps the delegate's split-level parallelism (multi-split under
    // the small-split regime) and reports no key-grouped partitioning.
    withConfs(factRegime) {
      assert(spark.conf.get("spark.sql.sources.v2.bucketing.enabled") === "true")
      val df = fmt(src).groupBy("shard").agg(count(lit(1)))
      df.collect()
      val scan = graftScans(df.queryExecution.executedPlan).head
      val parts = scan.scan.toBatch.planInputPartitions()
      assert(!parts.exists(_.isInstanceOf[org.apache.spark.sql.connector.read.HasPartitionKey]),
        "plain reads must serve stock (un-keyed) splits")
      assert(scan.outputPartitioning.toString.toLowerCase.indexOf("keygrouped") < 0,
        s"plain reads must not report key-grouped partitioning: ${scan.outputPartitioning}")
    }
  }

  test("SPJ keyed re-plan and diffStats survive a NULL partition key (hive default-partition dirs)") {
    // a user-keyed lake holding null-key rows lands them under
    // __HIVE_DEFAULT_PARTITION__ — the keyed re-plan's deterministic
    // sort used to NPE on the null group, and the audit's equi-join
    // used to split a healthy null shard into two one-sided rows
    val dir = Files.createTempDirectory("graft_spj_null").toString
    val a = Lake(spark, LakeConfig(s"$dir/src", dim = 3, partitionKey = Some("key")))
    val data = (0 until 300).map { i =>
      (s"r-$i", Seq(math.sin(i).toFloat, math.cos(i).toFloat, 0.1f),
        s"doc $i", if (i % 7 == 0) null else s"k${i % 3}")
    }.toDF("id", "vector", "document", "key")
    a.ingest(data)
    val b = a.cloneTo(s"$dir/rep")

    // fresh clone: every shard INCLUDING the null one reads in_sync,
    // exactly one audit row per distinct key
    val clean = a.diffStats(b).collect()
    assert(clean.length === 4, clean.mkString(", "))
    assert(clean.forall(_.getBoolean(3)), "fresh clone must be fully in_sync")
    assert(clean.count(_.isNullAt(0)) === 1, "the null key audits as ONE group")

    // diverge a null-key row (r-7: 7 % 7 == 0): the audit must
    // convict exactly the null shard, keyed re-plan included
    b.deleteWhere(col("id") === "r-7")
    val audited = a.diffStats(b).collect()
    val convicted = audited.filterNot(_.getBoolean(3))
    assert(convicted.length === 1 && convicted.head.isNullAt(0),
      s"expected exactly the null shard convicted, got ${convicted.mkString(", ")}")
  }

  test("diffStats fingerprint distinguishes null-placement and duplicated-pair divergence") {
    // two residuals the round-10 fingerprint was blind to, both
    // count-neutral AND invisible to the bare xxhash64/bit_xor fold:
    // (a) a value MIGRATING between two adjacent same-type columns
    //     (one null, the other holding it) folds the same non-null
    //     input sequence — xxhash64 passes its seed through on null,
    //     so only the new per-column null flags see the placement;
    // (b) each side gaining a different byte-identical row PAIR —
    //     pairs XOR-cancel under bit_xor, so only the new additive
    //     fold sees them.
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def mk(n: Int) = (0 until n).map { i =>
      (s"r-$i", Seq(math.sin(i).toFloat, math.cos(i).toFloat, 0.1f),
        s"doc $i", ts)
    }.toDF("id", "vector", "document", "timestamp")

    // (a) null-placement swap across adjacent string columns: sorted
    // hash-input order is (doc2, document, id, ...), so source
    // (doc2=null, document="z") and replica (doc2="z", document=null)
    // fold IDENTICAL non-null sequences
    val dir = Files.createTempDirectory("graft_spj_fp").toString
    val extra = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc2",
        org.apache.spark.sql.types.StringType)))
    def swapped(doc: Option[String], doc2: Option[String]) =
      Seq(("n-0", Seq(0.5f, 0.5f, 0.5f), doc.orNull, ts, doc2.orNull))
        .toDF("id", "vector", "document", "timestamp", "doc2")
    val a = Lake(spark, LakeConfig(s"$dir/src", dim = 3, numHashes = 2))
    a.bootstrap(); a.evolve(extra)
    val b = Lake(spark, LakeConfig(s"$dir/rep", dim = 3, numHashes = 2))
    b.bootstrap(); b.evolve(extra)
    a.ingest(mk(40)); b.ingest(mk(40))
    a.ingest(swapped(doc = Some("z"), doc2 = None))
    b.ingest(swapped(doc = None, doc2 = Some("z")))
    val victimShard = a.read().where(col("id") === "n-0")
      .select("shard").collect().head.getInt(0)
    val afterSwap = a.diffStats(b).collect()
    assert(afterSwap.forall(r => r.getLong(1) == r.getLong(2)),
      "the placement swap must be count-neutral")
    assert(afterSwap.filterNot(_.getBoolean(3)).map(_.getInt(0)).toSet === Set(victimShard),
      "null-placement divergence must convict exactly the victim shard")

    // (b) dueling byte-identical pairs: pick two distinct stored rows
    // of ONE shard; the source gains two exact copies of the first,
    // the replica two exact copies of the second — counts equal, each
    // pair XOR-cancels, only the additive fold diverges
    val dir2 = Files.createTempDirectory("graft_spj_fp2").toString
    val a2 = Lake(spark, LakeConfig(s"$dir2/src", dim = 3, numHashes = 2))
    a2.ingest(mk(40))
    val b2 = a2.cloneTo(s"$dir2/rep")
    val shardOf = a2.read().groupBy("shard").count()
      .where(col("count") >= 2).select("shard").collect().head.getInt(0)
    val pair = a2.read().where(col("shard") === shardOf)
      .select("id", "vector", "metadata", "document", "timestamp")
      .orderBy("id").limit(2).collect()
    def twice(r: org.apache.spark.sql.Row) =
      Seq(0, 1).map(_ => (r.getString(0), r.getSeq[Float](1),
        r.getMap[String, String](2).toMap, r.getString(3), r.getTimestamp(4)))
        .toDF("id", "vector", "metadata", "document", "timestamp")
    a2.ingest(twice(pair(0)))
    b2.ingest(twice(pair(1)))
    val afterDup = a2.diffStats(b2).collect()
    assert(afterDup.forall(r => r.getLong(1) == r.getLong(2)),
      "the duplication must be count-neutral")
    assert(afterDup.filterNot(_.getBoolean(3)).map(_.getInt(0)).toSet === Set(shardOf),
      "duplicated-pair divergence must convict exactly the victim shard")
  }

  test("SPJ mode never changes WHAT is read: literal shard pruning and full-scan aggregates agree") {
    val full = fmt(src).count()
    val one = fmt(src).where(col("shard") === 3).count()
    withConfs(spjConfs) {
      assert(fmt(src).count() === full)
      assert(fmt(src).where(col("shard") === 3).count() === one)
      // single-shard scans collapse to one keyed partition
      val df = fmt(src).where(col("shard") === 3)
      df.collect()
      val parts = graftScans(df.queryExecution.executedPlan)
        .head.scan.toBatch.planInputPartitions()
      assert(parts.length === 1 &&
        parts.head.isInstanceOf[org.apache.spark.sql.connector.read.HasPartitionKey],
        s"expected one keyed partition, got ${parts.length}")
    }
  }
}
