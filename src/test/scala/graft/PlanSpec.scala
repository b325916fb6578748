package graft

import graft.queries.Registry

/** Physical-plan shape guards: the properties that make these queries
  * scale are asserted, not assumed — filter pushdown into the parquet
  * scan, column pruning, broadcast joins for small sides, and top-k via
  * TakeOrderedAndProject instead of a global sort. */
class PlanSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    Registry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q_knn_derived_pq: the rerank plan carries LITERAL shard directory pruning + id pushdown; the candidate cut ran on the code table alone") {
    // the registry fn's candidate phase (heap top-k over the derived
    // code table) already ran by the time the returned frame exists —
    // what remains IS the rerank, and its scan must prove the pruning
    val p = plan("q_knn_derived_pq")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert("""PartitionFilters: \[[^\]]*shard#\d+ IN(SET)?[ (]""".r
      .findFirstIn(p).isDefined, p.take(3000))
    assert(p.contains("In(id, ["), p.take(3000))
    // the rerank reads the BASE lake, not the code table
    assert(p.contains("BatchScan graft:") && !p.contains("graft-derived:"),
      p.take(2000))
  }

  test("q_derived_join plans the co-located join through the graft format on both sides") {
    val p = plan("q_derived_join")
    assert(p.contains("graft:"), p.take(1200))
    assert(p.contains("graft-derived:"), p.take(1200))
  }

  test("q_admit_sketch routes via bloom literals; only the suspect branch joins") {
    val p = plan("q_admit_sketch")
    // the sketch literals gate BOTH union branches map-side
    assert(p.contains("might_contain"), p.take(1200))
    // exactly the two anti-joins (md5 + bucket) on the suspect branch,
    // plus the broadcast of the one-row split aggregate on each input —
    // the definite-novel branch must add NO join of its own
    val antiJoins = "LeftAnti".r.findAllIn(p).length
    assert(antiJoins === 2, s"expected 2 anti-joins, plan has $antiJoins")
  }

  test("q_filter_knn pushes the label predicate into the scan") {
    val p = plan("q_filter_knn")
    assert(p.contains("PushedFilters: [IsNotNull(label), EqualTo(label,3)]"), p.take(800))
  }

  test("q_knn_cosine reads only the two needed columns and uses heap top-k") {
    val p = plan("q_knn_cosine")
    assert(p.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>>"))
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("label"), "label column must be pruned")
  }

  test("q_join_docs broadcasts the dimension side") {
    assert(plan("q_join_docs").contains("BroadcastHashJoin"))
  }

  test("q_orders_nation broadcasts both dimension tables") {
    val p = plan("q_orders_nation")
    assert(p.split("BroadcastHashJoin").length >= 3, "expect 2 broadcast joins")
  }

  test("q_knn_batch broadcasts the query set, not the data") {
    val p = plan("q_knn_batch")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
  }

  test("q_near_dup_lsh is an equi-join on shard (hash/merge), not nested-loop") {
    val p = plan("q_near_dup_lsh")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p.take(500))
  }

  test("fused kernels appear in plans (vector_dot), whole-stage codegen active") {
    val p = plan("q_knn_cosine")
    assert(p.contains("vector_dot"))
    assert(p.contains("*")) // WholeStageCodegen marker
  }

  test("q_decontaminate broadcasts the eval shingle set against the corpus scan") {
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("q_split_train_test is one scan + one aggregate exchange (map-side split)") {
    val p = plan("q_split_train_test")
    // the split expression must not add a shuffle of its own: exactly one
    // exchange pair (partial agg -> final agg) plus the ordering exchange
    assert(p.split("Exchange").length - 1 <= 2, p.take(1200))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string,lang:string>"), p.take(1200))
  }

  test("q_vocab_top prunes to (doc_id, text) and uses heap top-k") {
    val p = plan("q_vocab_top")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p.take(800))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q_minhash_lsh band join carries only (band, id) — no hash arrays in the exchange") {
    val p = plan("q_minhash_lsh")
    // the exchanges feeding the band self-join must not ship hsd/mh arrays
    val joinSection = p.substring(p.indexOf("SortMergeJoin").max(0))
    assert(!joinSection.contains("hsd#") || joinSection.indexOf("hsd#") >
      joinSection.indexOf("Join"), "hash arrays must re-join after distinct")
  }

  test("q_knn_rerank runs both stages as heap top-k, no global sort") {
    val p = plan("q_knn_rerank")
    assert(p.split("TakeOrderedAndProject").length - 1 >= 2, p.take(1200))
    assert(!p.contains("Sort ["), "no full sort in a two-stage rerank")
  }

  test("q_tpch_q5 broadcasts all four dimensions; only the fact edge shuffles") {
    val p = plan("q_tpch_q5")
    assert(p.split("BroadcastHashJoin").length - 1 >= 4, p.take(1500))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_range_join is a bucketed equi-join, never a nested-loop theta join") {
    val p = plan("q_range_join")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "interval join must go through the day-bin equi-key")
  }

  test("q_rarity_score broadcasts the vocab rank table and heap-top-ks the output") {
    val p = plan("q_rarity_score")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
  }

  test("q_tpch_q18 scans lineitem once (the HAVING aggregate IS the join side)") {
    val p = plan("q_tpch_q18")
    assert(p.split("Scan parquet").length - 1 === 3,
      "exactly 3 scans expected: lineitem, orders, customer")
  }

  test("q_events_moving_avg pushes the user filter into the scan") {
    val p = plan("q_events_moving_avg")
    assert(p.contains("LessThan(user_id,5)"), p.take(1200))
  }

  test("q_tpch_q7 broadcasts both nation roles and the other dims") {
    val p = plan("q_tpch_q7")
    assert(p.split("BroadcastHashJoin").length - 1 >= 4, p.take(1500))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_no_urgent plans a hash anti join, never a nested loop") {
    val p = plan("q_no_urgent")
    assert(p.contains("LeftAnti"), p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_tpch_q4 plans the existence probe as a semi join, no nested loop") {
    val p = plan("q_tpch_q4")
    assert(p.contains("LeftSemi"), p.take(1500))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_tpch_q19 pushes each side's conjunct legs across the broadcast join") {
    val p = plan("q_tpch_q19")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    // the quantity envelope (1..30 across the three conjuncts) reaches
    // the lineitem scan even though the full OR needs part columns
    assert(p.contains("PushedFilters") && p.contains("l_quantity"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("q_cooccur broadcasts the top-50 vocab; pair join is an equi hash join") {
    val p = plan("q_cooccur")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_tfidf heap-top-ks instead of globally sorting the tf table") {
    val p = plan("q_tfidf")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("q_knn_pq is one scan + heap top-k (codes/LUT are literals, no join)") {
    val p = plan("q_knn_pq")
    assert(p.split("Scan parquet").length - 1 <= 2,
      "ADC scan must not add joins over the embeddings scan")
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
    assert(!p.contains("Exchange hashpartitioning"),
      "no shuffle belongs in a pure scan + top-k")
  }

  test("q_train_order takes each epoch's top-10 via heap top-k; the corpus never meets a window") {
    val p = plan("q_train_order")
    assert(p.split("TakeOrderedAndProject").length >= 3,
      s"each epoch branch must plan as TakeOrderedAndProject:\n${p.take(1500)}")
    // the row_number window exists, but it must sit ABOVE the union of
    // the two 10-row TakeOrdered branches — i.e. the plan has no sort
    // of the full corpus feeding a window directly
    assert(p.contains("Window"), p.take(800))
  }

  test("q_source_overlap self-joins the bounded (source, bucket) table on an equi-key") {
    val p = plan("q_source_overlap")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("NestedLoop"), "bucket equality must be an equi-join")
  }

  test("q_boilerplate ships 60-bit gram hashes, not phrase strings, through the join") {
    val p = plan("q_boilerplate")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("q_dedup_incremental probes the corpus via hash equi-joins; the split is broadcast") {
    val p = plan("q_dedup_incremental")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the one-row split aggregate must broadcast, not shuffle")
    assert(p.split("SortMergeJoin").length + p.split("ShuffledHashJoin").length
      + p.split("BroadcastHashJoin").length >= 3,
      s"both membership probes must be equi-joins:\n${p.take(1200)}")
  }

  test("q_semdedup pairs within cells via an equi-join on cell, never a nested loop over the corpus") {
    val p = plan("q_semdedup")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("CartesianProduct"), "cell equality must drive the join")
  }

  test("q_bloom_join prunes the probe scan with might_contain below the exact join") {
    val p = plan("q_bloom_join")
    assert(p.contains("might_contain"), p.take(800))
  }

  test("q_hybrid_rrf reduces both legs by heap top-k; windows rank only the 100-row lists") {
    val p = plan("q_hybrid_rrf")
    assert(p.split("TakeOrderedAndProject").length >= 3,
      s"both retrieval legs must be heap top-k:\n${p.take(1500)}")
    assert(p.contains("Window"), p.take(800))
  }

  test("q_maxsim is one scan + one hash aggregate — no join, no window") {
    val p = plan("q_maxsim")
    assert(p.contains("HashAggregate"), p.take(800))
    assert(!p.contains("Join"), "late-interaction max-reduce needs no join")
    assert(!p.contains("Window"), "no window either")
  }

  test("lake single-probe scan prunes to one shard directory") {
    import spark.implicits._
    val lake = Lake(spark, LakeConfig(
      s"${java.nio.file.Files.createTempDirectory("graft_plan")}/lake", dim = 5, numHashes = 4))
    val rng = new scala.util.Random(2)
    lake.ingest(Seq.fill(64)((Seq.fill(5)(rng.nextGaussian().toFloat), "d"))
      .toDF("vector", "document"))
    val q = Seq.fill(5)(rng.nextGaussian())
    val scan = lake.topK(q, 3).queryExecution.executedPlan.toString
    val routed = lake.lsh.shardOf(q)
    assert(scan.contains(s"shard#") && scan.contains(s"= $routed)") ||
      scan.contains(s"shard = $routed"), scan.take(1200))
  }

  test("multi-generation lake: pruning reaches EVERY union branch's scan") {
    import spark.implicits._
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.functions.col
    val lake = Lake(spark, LakeConfig(
      s"${java.nio.file.Files.createTempDirectory("graft_plan_gen")}/lake",
      dim = 5, numHashes = 4))
    val rng = new scala.util.Random(9)
    lake.ingest((0 until 64).map(i =>
      (s"g$i", Seq.fill(5)(rng.nextGaussian().toFloat), "d"))
      .toDF("id", "vector", "document"))
    // a targeted rewrite: the lake is now TWO live generations (the
    // rewritten shard in the new one, survivors manifest-named in the old)
    assert(lake.deleteWhere(col("id") === "g0") === 1L)
    val q = Seq.fill(5)(rng.nextGaussian())
    val routed = lake.lsh.shardOf(q)
    val plan = lake.topK(q, 3).queryExecution.executedPlan
    val scans = plan.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    // every branch's scan carries the literal shard predicate as a
    // PARTITION filter — at 100 TB each branch lists only its routed
    // directory, union or not
    scans.foreach { s =>
      // require "= <routed>" so an attribute exprId that happens to
      // collide with the routed number (shard#3 when routed=3) cannot
      // satisfy the check vacuously
      assert(s.partitionFilters.exists(
        _.toString.matches(s".*shard.*=\\s*$routed\\b.*")),
        s"branch scan missing partition filter: ${s.partitionFilters}")
      // and the RESOLVED file list after pruning touches ONLY the
      // routed directory — the actual outcome, not just the predicate
      val files = s.selectedPartitions.toPartitionArray
        .map(_.filePath.toString)
      files.foreach(f => assert(f.contains(s"shard=$routed/"),
        s"pruned branch still lists $f"))
    }
    // end-to-end: the pruned result equals the routed-shard subset
    lake.topK(q, 3).collect()
      .foreach(r => assert(r.getAs[Int]("shard") === routed))
  }

  test("every partition-less window in the registry sits above a cardinality-bounding node") {
    // the Verify log's "No Partition Defined for Window operation"
    // warnings are BENIGN here by construction: each global window
    // ranks a bounded list (a post-aggregate table, a top-k, a literal
    // frame), never corpus rows. This pins that construction for the
    // WHOLE registry — a future query feeding an unbounded scan into a
    // partition-less window fails this spec instead of shipping a
    // single-partition sort of the corpus.
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec

    // cardinality-bounding nodes: below any of these, input size no
    // longer reaches the window (aggregates bound by group count —
    // every global-window consumer groups on a bounded key set: labels,
    // cells, epochs, vocab terms; limits/top-k bound outright)
    def bounds(p: SparkPlan): Boolean = p match {
      case _: HashAggregateExec | _: ObjectHashAggregateExec |
           _: SortAggregateExec | _: TakeOrderedAndProjectExec |
           _: GlobalLimitExec | _: LocalLimitExec |
           _: CollectLimitExec | _: LocalTableScanExec => true
      case w: WindowGroupLimitExec => w.partitionSpec.nonEmpty || bounded(w.child)
      case _ => false
    }
    // every leaf path must hit a bounding node before a data scan
    def bounded(p: SparkPlan): Boolean =
      if (bounds(p)) true
      else p match {
        case _: FileSourceScanExec | _: BatchScanExec |
             _: RowDataSourceScanExec => false
        case a: AdaptiveSparkPlanExec => bounded(a.executedPlan)
        case c: InMemoryTableScanExec =>
          // a cached/materialized table is as bounded as what built it
          bounded(c.relation.cachedPlan)
        case leaf if leaf.children.isEmpty && leaf.subqueries.isEmpty =>
          // unknown leaves (RDD scans etc.) count as UNBOUNDED — the
          // audit must fail closed, not vacuously pass new plan shapes
          false
        case other => other.children.forall(bounded)
      }
    def globalWindows(p: SparkPlan): Seq[WindowExec] = p.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => Seq(w)
      case a: AdaptiveSparkPlanExec => globalWindows(a.executedPlan)
      case c: InMemoryTableScanExec => globalWindows(c.relation.cachedPlan)
    }.flatten

    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    var audited = 0
    Registry.all.foreach { q =>
      val plan = q.fn(spark, dir).queryExecution.executedPlan
      val gw = globalWindows(plan)
      audited += gw.size
      gw.foreach { w =>
        if (!bounded(w.child)) offenders += s"${q.name}: $w"
      }
    }
    assert(offenders.isEmpty,
      s"partition-less windows over unbounded input:\n${offenders.mkString("\n")}")
    // the audit is exercised, not vacuous: the registry is KNOWN to
    // carry global windows (q_hybrid_rrf ranks two 100-row lists,
    // q_cluster_labels ranks the cells-by-vocab table, ...)
    assert(audited >= 3, s"expected several global windows, found $audited")
  }
}
