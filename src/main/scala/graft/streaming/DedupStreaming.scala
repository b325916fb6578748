package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.{TextFunctions => T}

/** Streaming near-dup admission gate — the continuous form of the batch
  * SimHash dedup family (q_simhash / q_dedup_keep_best): documents
  * arrive on a stream, the FIRST document to claim a SimHash bucket is
  * admitted, and every later arrival hashing into the same bucket is
  * rejected as a near-duplicate — across batches, because the claim
  * lives in keyed state.
  *
  * Scale shape: the bucket is computed as a COLUMN (fused codegen
  * SimHash kernel — distributed, map-side), so only the grouping
  * shuffles; state is ONE long per occupied bucket and the bucket space
  * is bounded at 2^bits keys, so total state is bounded no matter how
  * long the stream runs. The reference has no streaming at all
  * (SURVEY.md §2.10).
  */
object DedupStreaming {

  final case class DedupDecision(doc_id: Long, bucket: Long, admitted: Boolean)

  /** Streaming EXACT-dedup gate: admit each content fingerprint once
    * within the watermark horizon, via Spark's own
    * `dropDuplicatesWithinWatermark` state — the built-in complement to
    * the custom near-dup state above. State here is bounded by TIME
    * (keys older than the watermark are evicted) rather than by key
    * space, which is the right bound for exact fingerprints: their key
    * space grows with the corpus, a SimHash bucket space doesn't. Use
    * this gate for replay/at-least-once dedup at ingest; the near-dup
    * gate for content-level dedup.
    *
    * @param docs streaming frame with (doc_id, text, ts) — event time
    * @param horizon how late a duplicate can arrive and still be caught */
  def exactDedupGate(docs: DataFrame, horizon: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", T.fingerprint(col("text")))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("fp")

  /** Stream-STATIC admission gate — the continuous form of
    * q_dedup_incremental: new documents stream in and are admitted only
    * if they are neither an exact duplicate (md5) nor a near duplicate
    * (occupied SimHash bucket) of an existing STATIC corpus. Two
    * stream-static LEFT ANTI equi-joins; the static side ships only
    * (md5, bucket) key columns, never text, and is re-read per
    * micro-batch — so a corpus that grows between triggers (e.g. a lake
    * the admitted docs are appended to) tightens the gate continuously.
    * Complements the stateful gates above: those dedup the stream
    * against ITSELF, this one dedups it against the corpus. The
    * per-batch corpus re-scan is the right trade only while the corpus
    * is small; at scale use [[corpusGate]], which snapshots the corpus
    * once per refresh into broadcast bloom sketches and joins only
    * sketch hits.
    *
    * @param newDocs streaming frame with (doc_id, text)
    * @param corpus  static frame with (text) — the existing collection
    * @param bits    SimHash width */
  def admitAgainstCorpus(newDocs: DataFrame, corpus: DataFrame,
      bits: Int = 16): DataFrame = {
    val keyed = newDocs
      .withColumn("h", md5(col("text").cast("binary")))
      .withColumn("bucket",
        T.simhashFromHashes(T.hashes31(array_distinct(T.tokens(col("text")))), bits))
    val corpusH = corpus
      .select(md5(col("text").cast("binary")).as("c_h")).distinct()
    val corpusB = corpus
      .select(T.simhashFromHashes(
        T.hashes31(array_distinct(T.tokens(col("text")))), bits).as("c_bucket"))
      .distinct()
    keyed
      .join(corpusH, keyed("h") === corpusH("c_h"), "left_anti")
      .join(corpusB, keyed("bucket") === corpusB("c_bucket"), "left_anti")
  }

  /** Sketch-backed corpus admission — the SCALE form of
    * [[admitAgainstCorpus]]. That gate's stream-static anti-joins
    * re-execute the static corpus plan EVERY micro-batch: at a 1 s
    * trigger against a 100 TB corpus that is a full corpus scan per
    * second, almost all of it spent proving that brand-new documents
    * match nothing. The gate instead snapshots the corpus ONCE per
    * [[CorpusGate.refresh]]: one corpus scan materializes the (md5,
    * SimHash-bucket) key table, and two bloom sketches built FROM that
    * table are embedded in the batch plan as literals. Per batch, the
    * sketches clear definite-novel documents map-side — no join, no
    * shuffle, no corpus access — and only sketch HITS (true dups +
    * bloom false positives) take the exact anti-join against the
    * materialized key table, which kills the false positives.
    * Admission decisions are therefore IDENTICAL to
    * [[admitAgainstCorpus]] against the same snapshot (the bloom is
    * pure routing, same as [[graft.operators.BloomJoin]]).
    *
    * Use inside `foreachBatch`, calling [[CorpusGate.admitBatch]] per
    * micro-batch and [[CorpusGate.refresh]] on whatever cadence the
    * corpus grows (e.g. after appending admitted docs); between
    * refreshes the gate intentionally tests against the snapshot — the
    * trade [[admitAgainstCorpus]]'s per-batch rescan made the other
    * way.
    *
    * @param corpus static frame with (text) — BY NAME, re-evaluated on
    *        every [[CorpusGate.refresh]]: a parquet/lake-backed plan
    *        snapshots its file listing when the DataFrame is built, so
    *        a captured frame would re-scan the construction-time file
    *        set forever and never see corpus growth
    * @param bits SimHash width
    * @param estItems expected corpus keys, sizes the sketches
    * @param numBits bloom bits (default ≈2% fpp at 1M keys) */
  def corpusGate(corpus: => DataFrame, bits: Int = 16,
      estItems: Long = 1000000L, numBits: Long = 8388608L): CorpusGate =
    new CorpusGate(corpus, bits, estItems, numBits)

  final class CorpusGate private[DedupStreaming] (corpus: => DataFrame,
      bits: Int, estItems: Long, numBits: Long) {
    import graft.operators.{BloomJoin, Materialize}

    private final case class Snapshot(
        md5Sketch: Array[Byte], bucketSketch: Array[Byte],
        md5Keys: DataFrame, bucketKeys: DataFrame)

    @volatile private var snap: Snapshot = build()

    /** Re-snapshot the corpus: exactly ONE corpus scan (the key table
      * is materialized via [[Materialize.cut]]; both sketches and both
      * exact key sets derive from the materialized copy). */
    def refresh(): Unit = snap = build()

    // plain var: refreshIfChanged is the only accessor and is
    // synchronized — an AtomicReference would just suggest lock-free
    // access that no longer exists
    private var refreshToken: Option[Any] = None

    /** Refresh only when `token` differs from the one that built the
      * current snapshot — pair with `Lake.lastUpdate()` to re-snapshot
      * exactly when the corpus lake actually changed rather than on a
      * blind timer. The FIRST call always refreshes (the construction
      * build carries no token, and the corpus may have moved since);
      * each later call costs one token comparison until the token
      * moves. Returns true when a refresh ran.
      *
      * The token is committed only AFTER refresh() succeeds: a
      * transient corpus-read failure leaves the token unchanged, so
      * the next micro-batch retries instead of permanently serving the
      * stale snapshot (token-advanced-but-never-refreshed). Serialized
      * so two concurrent callers cannot both pay a corpus scan. */
    def refreshIfChanged(token: Any): Boolean = synchronized {
      if (refreshToken == Some(token)) false
      else { refresh(); refreshToken = Some(token); true }
    }

    private def build(): Snapshot = {
      val keys = Materialize.cut(corpus.select(
        md5(col("text").cast("binary")).as("c_h"),
        T.simhashFromHashes(
          T.hashes31(array_distinct(T.tokens(col("text")))), bits).as("c_bucket")))
      // ONE aggregate job builds both sketches — bloom insertion is
      // idempotent, so the sketch path needs no distinct; only the
      // exact anti-join sides (lazy, probed per batch) deduplicate
      val row = keys.agg(
        BloomJoin.bloomAgg(col("c_h"), estItems, numBits).as("bf_h"),
        BloomJoin.bloomAgg(col("c_bucket"), estItems, numBits).as("bf_b"))
        .head()
      // the anti-join sides are materialized too: per batch they are
      // READ (cheap block scan), never recomputed through the distinct
      Snapshot(
        row.getAs[Array[Byte]]("bf_h"), row.getAs[Array[Byte]]("bf_b"),
        Materialize.cut(keys.select("c_h").distinct()),
        Materialize.cut(keys.select("c_bucket").distinct()))
    }

    /** Admit the batch's documents novel to the snapshot: same output
      * as [[admitAgainstCorpus]] (input columns + h + bucket). */
    def admitBatch(batch: DataFrame): DataFrame = {
      val s = snap
      val keyed = batch
        .withColumn("h", md5(col("text").cast("binary")))
        .withColumn("bucket",
          T.simhashFromHashes(T.hashes31(array_distinct(T.tokens(col("text")))), bits))
      // NULL sketch (empty corpus) → might_contain NULL → not a hit
      val hit = coalesce(BloomJoin.mightContain(s.md5Sketch, col("h")), lit(false)) ||
        coalesce(BloomJoin.mightContain(s.bucketSketch, col("bucket")), lit(false))
      val clean = keyed.where(!hit) // definite-novel: admitted with zero joins
      val suspects = keyed.where(hit)
      val afterMd5 = suspects.join(s.md5Keys,
        suspects("h") === s.md5Keys("c_h"), "left_anti")
      val cleared = afterMd5.join(s.bucketKeys,
        afterMd5("bucket") === s.bucketKeys("c_bucket"), "left_anti")
      clean.unionByName(cleared)
    }
  }

  /** @param docs streaming (or batch) frame with (doc_id, text)
    * @param bits SimHash width — the dedup aggressiveness dial */
  def nearDupGate(docs: DataFrame, bits: Int = 16): Dataset[DedupDecision] = {
    import docs.sparkSession.implicits._
    docs
      .select(col("doc_id").cast("long").as("doc_id"),
        T.simhashFromHashes(T.hashes31(array_distinct(T.tokens(col("text")))), bits)
          .as("bucket"))
      .as[(Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, DedupDecision](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (bucket, it, state: GroupState[Long]) =>
          var keeper = state.getOption.getOrElse(Long.MinValue)
          // doc_id order within the batch for determinism
          val out = it.toSeq.sortBy(_._1).map { case (id, _) =>
            if (keeper == Long.MinValue) {
              keeper = id
              DedupDecision(id, bucket, admitted = true)
            } else DedupDecision(id, bucket, admitted = id == keeper)
          }
          state.update(keeper)
          out.iterator
      }
  }
}
