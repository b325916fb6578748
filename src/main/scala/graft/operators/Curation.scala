package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Training-data curation as a reusable operator API — the same
  * programs the oracle-checked registry queries run
  * ([[graft.queries.CurationQueries]] delegates here, so the DuckDB
  * gate proves THIS code). */
object Curation {

  /** Deterministic hash split: 'train' for md5-h60(key) mod 100 <
    * trainPct else 'test'. A pure map-side expression on a stable key —
    * reproducible across runs, engines, and reshuffles, which is the
    * only split discipline that survives a 100 TB corpus. */
  def splitCol(key: Column, trainPct: Int = 90): Column =
    when(T.h60(key.cast("string")) % 100 < trainPct, "train").otherwise("test")

  /** Fixed token-budget sequence packing: adds `pack_id` per group, docs
    * taken in `orderCol` order, pack = (running-sum − own) div budget.
    * One window per group partition, integer arithmetic only. */
  def packIds(df: DataFrame, groupCol: String, orderCol: String,
      tokenCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
    df.withColumn("_cum", sum(col(tokenCol)).over(w))
      .withColumn("pack_id", expr(s"(_cum - $tokenCol) div ${budget}L"))
      .drop("_cum")
  }

  /** Deterministic stratified sample: the first `n` rows per group in
    * md5-h60(key) order. Hash order is a reproducible, engine-portable
    * stand-in for "uniform at random" — same discipline as [[splitCol]]
    * — and the per-group bounded window means no global sort: at 100 TB
    * this is one shuffle on the group key with a k-row heap per group
    * (Spark plans `row_number <= n` as a running rank that never
    * materializes the full group ordering). */
  def stratifiedSample(df: DataFrame, groupCol: String, keyCol: String,
      n: Int): DataFrame = {
    // `rk` is part of the output contract — refuse to silently clobber
    // a caller column of the same name
    require(!df.columns.contains("rk"),
      "stratifiedSample adds an 'rk' rank column; input already has one — rename it first")
    val w = Window.partitionBy(groupCol)
      .orderBy(T.h60(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("rk", row_number().over(w)).where(col("rk") <= n)
  }

  /** Eval-set decontamination: one row per (corpus row, shared word
    * n-gram hash) — aggregate or `distinct` on the id downstream. The
    * eval shingle-hash set is broadcast (small); the corpus side is one
    * scan + explode. `textCol` is dropped from the output. */
  def contaminationHits(corpus: DataFrame, evalTexts: DataFrame,
      textCol: String, shingleN: Int = 5): DataFrame = {
    val evalHashes = evalTexts
      .select(explode(T.shingleHashes(col(textCol), shingleN)).as("h")).distinct()
    corpus
      .withColumn("h", explode(T.shingleHashes(col(textCol), shingleN)))
      .drop(textCol)
      .join(broadcast(evalHashes), Seq("h"))
  }
}
