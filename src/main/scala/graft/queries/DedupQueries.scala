package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextFunctions => T}

/** Deduplication operators over `documents` — the core training-data
  * pipeline family: exact (hash group), MinHash+LSH banding, SimHash,
  * and character-n-gram Jaccard. Each pairs a Spark program with a
  * DuckDB oracle built from the same portable-hash contract
  * ([[graft.functions.TextFunctions]]), so signatures match bit-for-bit.
  *
  * Scale notes (the reason these shapes were chosen):
  *  - exact dedup = one hash-aggregate, fully map-side-combinable;
  *  - MinHash banding turns all-pairs O(n²) into an equi-join on band
  *    keys (shuffle on band, candidates only within buckets);
  *  - SimHash groups by a 16-bit fingerprint — a plain hash aggregate;
  *  - all-pairs n-gram Jaccard is kept as the *correctness baseline*
  *    and deliberately restricted to a bounded id range.
  */
object DedupQueries {

  /** Exact duplicate detection: per-lang row count, distinct-text count,
    * and duplicate-row count via md5 grouping. */
  val qDedupExact = Q(
    "q_dedup_exact",
    (s, dir) => Tables.documents(s, dir)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        countDistinct(md5(col("text").cast("binary"))).as("n_distinct"),
        (count(lit(1)) - countDistinct(md5(col("text").cast("binary")))).as("n_dup_rows"))
      .orderBy("lang"),
    Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n,
                   CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
                   CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_dup_rows
            FROM documents GROUP BY lang ORDER BY lang"""))

  private val MinhashK = 16
  private val Bands = 4 // 4 bands × 4 rows
  private val mhParams = T.minhashParams(MinhashK)

  /** MinHash + LSH banding near-dup candidates, verified with exact
    * Jaccard over word-bigram shingle sets. Pipeline: shingle → 16
    * minhashes → 4 band keys → explode → equi-join on band → distinct
    * candidate pairs (ids only) → re-join signatures → exact Jaccard
    * ≥ 0.2. */
  val qMinhashLsh = Q(
    "q_minhash_lsh",
    (s, dir) => {
      // the reusable operator pipeline (graft.operators.TextDedup) —
      // this oracle row is what proves the operator end-to-end.
      // localCheckpoint: the signature table feeds both band-join sides
      // AND the post-distinct signature re-joins — shingling + ~1.5M md5
      // hashes run once. Candidate pairs carry ONLY (band, id); the wide
      // hash arrays re-join by id AFTER dedup (the oracle's CTE shape).
      val sigs = graft.operators.TextDedup
        .minhashSignatures(Tables.documents(s, dir), "doc_id", "text",
          shingleN = 2, k = MinhashK)
        .transform(graft.operators.Materialize.cut(_))
      val pairs = graft.operators.TextDedup.bandedCandidates(sigs, MinhashK, Bands)
      graft.operators.TextDedup.jaccardVerify(pairs, sigs, 0.2)
        .orderBy(col("jaccard").desc, col("a_id"), col("b_id"))
    },
    Some(s"""WITH $sqlPairsCtes
          SELECT a_id, b_id, jaccard FROM j WHERE jaccard >= 0.2
          ORDER BY jaccard DESC, a_id, b_id"""))

  /** Shared oracle CTE chain ending in `j` = jaccard-scored candidate
    * pairs — the SQL twin of minhashSignatures→bandedCandidates→
    * jaccardVerify, reused by q_minhash_lsh and q_dedup_clusters. */
  private lazy val sqlPairsCtes: String = {
    val hsE = s"list_transform(list_distinct(${T.sqlShingles("text", 2)}), s -> ${T.sqlH31("s")})"
    val sigE = T.sqlMinhashSigFromHashes("hs", mhParams)
    val bandE = (0 until Bands).map { b =>
      val rows = (0 until MinhashK / Bands).map(r => s"mh${b * (MinhashK / Bands) + r}")
      s"('$b' || '-' || " + rows.mkString(" || '-' || ") + ")"
    }.mkString("[", ", ", "]")
    val mhCols = sigE.zipWithIndex.map { case (e, i) => s"$e AS mh$i" }.mkString(", ")
    s"""dh AS (SELECT doc_id, $hsE AS hs FROM documents),
        d1 AS (SELECT doc_id, list_distinct(hs) AS hsd, $mhCols FROM dh),
        d2 AS (SELECT doc_id, unnest($bandE) AS band FROM d1),
        p AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
              FROM d2 a JOIN d2 b ON a.band = b.band AND a.doc_id < b.doc_id),
        j AS (SELECT p.a_id, p.b_id,
                     round(len(list_intersect(da.hsd, db.hsd))::DOUBLE /
                           (len(da.hsd) + len(db.hsd) - len(list_intersect(da.hsd, db.hsd)))::DOUBLE, 6) AS jaccard
              FROM p JOIN d1 da ON p.a_id = da.doc_id JOIN d1 db ON p.b_id = db.doc_id)"""
  }

  /** Dedup CLUSTERING: near-dup pairs are not transitive (a~b, b~c ⇒
    * one group {a,b,c}), so the canonical-document choice needs the
    * connected component. Spark side: iterative min-label propagation
    * ([[graft.operators.ConnectedComponents]]); oracle side: DuckDB
    * recursive CTE transitive closure — two entirely different
    * algorithms agreeing on the same fixpoint is the strongest parity
    * row in the registry. Per-component profile output. */
  val qDedupClusters = Q(
    "q_dedup_clusters",
    (s, dir) => {
      val sigs = graft.operators.TextDedup
        .minhashSignatures(Tables.documents(s, dir), "doc_id", "text",
          shingleN = 2, k = MinhashK)
        .transform(graft.operators.Materialize.cut(_))
      val pairs = graft.operators.TextDedup
        .jaccardVerify(graft.operators.TextDedup.bandedCandidates(sigs, MinhashK, Bands), sigs, 0.2)
        .select("a_id", "b_id")
      graft.operators.ConnectedComponents.components(pairs)
        .groupBy("component")
        .agg(count(lit(1)).as("n_docs"), min("id").as("min_doc"), max("id").as("max_doc"))
        .orderBy("component")
    },
    Some(s"""WITH RECURSIVE $sqlPairsCtes,
          v AS (SELECT a_id, b_id FROM j WHERE jaccard >= 0.2),
          edges AS (SELECT a_id AS src, b_id AS dst FROM v
                    UNION SELECT b_id, a_id FROM v),
          reach AS (SELECT src, dst FROM edges
                    UNION
                    SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
          comp AS (SELECT src AS id, least(src, min(dst)) AS component
                   FROM reach GROUP BY src)
          SELECT component, CAST(count(*) AS BIGINT) AS n_docs,
                 min(id) AS min_doc, max(id) AS max_doc
          FROM comp GROUP BY component ORDER BY component"""))

  /** 16-bit SimHash fingerprint groups: collision buckets with >1 doc
    * (hash-aggregate dedup at fingerprint granularity). */
  val qSimhash = Q(
    "q_simhash",
    (s, dir) => Tables.documents(s, dir)
      .select(col("doc_id"),
        graft.operators.TextDedup.simhashCol(col("text"), 16).as("simhash"))
      .groupBy("simhash")
      .agg(count(lit(1)).as("n"), min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .where(col("n") > 1)
      .orderBy("simhash"),
    Some {
      val sh = T.sqlSimhash(s"list_distinct(${T.sqlTokens("text")})", 16)
      s"""SELECT simhash, CAST(count(*) AS BIGINT) AS n,
                 min(doc_id) AS min_doc, max(doc_id) AS max_doc
          FROM (SELECT doc_id, $sh AS simhash FROM documents)
          GROUP BY simhash HAVING count(*) > 1 ORDER BY simhash"""
    })

  /** Character-3-gram Jaccard near-dup — exact all-pairs baseline,
    * bounded to doc_id < 200 within the same lang; top-20 pairs.
    * Jaccard runs over 60-bit HASHED n-gram sets on both engines
    * (string-set Jaccard ≡ hash-set Jaccard at 2^-60 collision odds):
    * the per-pair intersection compares longs instead of strings, and
    * the n-gram generation is one fused kernel pass instead of an
    * interpreted per-gram lambda. */
  val qNgramJaccard = Q(
    "q_ngram_jaccard",
    (s, dir) => {
      // a document under 3 code points has an EMPTY 3-gram set; two
      // such docs pair as 0/0 = NaN, which Spark orders GREATEST, so
      // degenerate pairs would own the DESC top-20 (and DuckDB's NaN
      // ordering differs by version). Guarded on both engines.
      val d = Tables.documents(s, dir)
        .where(col("doc_id") < 200)
        .select(col("doc_id"), col("lang"),
          T.charNgramHashes(col("text"), 3).as("g"))
        .where(size(col("g")) > 0)
      val a = d.select(col("lang"), col("doc_id").as("a_id"), col("g").as("a_g"))
      val b = d.select(col("lang"), col("doc_id").as("b_id"), col("g").as("b_g"))
      val inter = size(array_intersect(col("a_g"), col("b_g"))).cast("double")
      a.join(b, Seq("lang"))
        .where(col("a_id") < col("b_id"))
        .select(col("lang"), col("a_id"), col("b_id"),
          round(inter / (size(col("a_g")) + size(col("b_g")) - inter), 6).as("jaccard"))
        .orderBy(col("jaccard").desc, col("a_id"), col("b_id"))
        .limit(20)
    },
    Some {
      val g = T.sqlCharNgramHashes("text", 3)
      s"""WITH d0 AS (SELECT doc_id, lang, $g AS g FROM documents WHERE doc_id < 200),
               d AS (SELECT * FROM d0 WHERE len(g) > 0)
          SELECT a.lang, a.doc_id AS a_id, b.doc_id AS b_id,
                 round(len(list_intersect(a.g, b.g))::DOUBLE /
                       (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))::DOUBLE, 6) AS jaccard
          FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
          ORDER BY jaccard DESC, a_id, b_id LIMIT 20"""
    })

  /** Rolling-hash document fingerprints: per-source distinct fingerprint
    * count vs rows (content-identity summary). */
  val qFingerprint = Q(
    "q_fingerprint",
    (s, dir) => Tables.documents(s, dir)
      .select(col("source"), T.fingerprint(col("text")).as("fp"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"), countDistinct("fp").as("n_fp"))
      .orderBy("source"),
    Some {
      val fp = T.sqlFingerprint("text")
      s"""SELECT source, CAST(count(*) AS BIGINT) AS n,
                 CAST(count(DISTINCT fp) AS BIGINT) AS n_fp
          FROM (SELECT source, $fp AS fp FROM documents)
          GROUP BY source ORDER BY source"""
    })

  /** The dedup ACTION, not just detection: within each 16-bit SimHash
    * bucket keep the highest-quality document (quality-score argmax,
    * doc_id tiebreak) and drop the rest — the canonical training-data
    * "dedup + keep best" pipeline composed from the detection and
    * scoring operators. Output is the per-lang keep/drop tally. */
  val qDedupKeepBest = Q(
    "q_dedup_keep_best",
    (s, dir) => {
      // the reusable keep-best operator; this oracle row proves it
      val flagged = graft.operators.TextDedup.keepBestBySimhash(
        Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("text")),
        "doc_id", "text", round(T.qualityScore(col("text")), 6), bits = 16)
      flagged.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(!col("kept"), 1L).otherwise(0L)).as("n_dropped"))
        .orderBy("lang")
    },
    Some {
      val sh = T.sqlSimhash(s"list_distinct(${T.sqlTokens("text")})", 16)
      val q = T.sqlQualityScore("text")
      s"""WITH scored AS (SELECT doc_id, lang, round($q, 6) AS q, $sh AS simhash FROM documents),
          ranked AS (SELECT lang,
                            row_number() OVER (PARTITION BY simhash ORDER BY q DESC, doc_id) AS rn
                     FROM scored)
          SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                 CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
          FROM ranked GROUP BY lang ORDER BY lang"""
    })

  /** Asymmetric CONTAINMENT near-dup detection: |A∩B| / min(|A|,|B|)
    * over 3-gram hash sets. Jaccard misses subset/superset duplication
    * (a document embedded verbatim inside a longer one scores low on
    * |A∩B|/|A∪B| but 1.0 on containment) — this is the quote/excerpt
    * detector a curation pipeline runs NEXT TO Jaccard, same bounded
    * baseline posture (doc_id < 200; the unbounded scale path is the
    * LSH-bucketed family). Integer set sizes + one IEEE division. */
  val qContainment = Q(
    "q_containment",
    (s, dir) => {
      // empty 3-gram set (doc under 3 code points) → least(...) = 0 →
      // 0/0 = NaN, ordered greatest by Spark; same guard as
      // q_ngram_jaccard, mirrored into the oracle
      val d = Tables.documents(s, dir)
        .where(col("doc_id") < 200)
        .select(col("doc_id"), col("lang"),
          T.charNgramHashes(col("text"), 3).as("g"))
        .where(size(col("g")) > 0)
      val a = d.select(col("lang"), col("doc_id").as("a_id"), col("g").as("a_g"))
      val b = d.select(col("lang"), col("doc_id").as("b_id"), col("g").as("b_g"))
      val inter = size(array_intersect(col("a_g"), col("b_g"))).cast("double")
      a.join(b, Seq("lang"))
        .where(col("a_id") < col("b_id"))
        .select(col("lang"), col("a_id"), col("b_id"),
          round(inter / least(size(col("a_g")), size(col("b_g"))), 6).as("containment"))
        .orderBy(col("containment").desc, col("a_id"), col("b_id"))
        .limit(20)
    },
    Some {
      val g = T.sqlCharNgramHashes("text", 3)
      s"""WITH d0 AS (SELECT doc_id, lang, $g AS g FROM documents WHERE doc_id < 200),
               d AS (SELECT * FROM d0 WHERE len(g) > 0)
          SELECT a.lang, a.doc_id AS a_id, b.doc_id AS b_id,
                 round(len(list_intersect(a.g, b.g))::DOUBLE /
                       least(len(a.g), len(b.g))::DOUBLE, 6) AS containment
          FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
          ORDER BY containment DESC, a_id, b_id LIMIT 20"""
    })

  /** Between-source duplication matrix — the provenance audit that
    * tells a curation run WHO copies WHOM: sources sharing a 16-bit
    * SimHash bucket contain near-identical token distributions, so the
    * count of shared occupied buckets per source pair ranks
    * cross-source contamination. Bounded by construction: the distinct
    * (source, bucket) table is at most |sources| × 2^16 rows, so the
    * self-join cannot explode at any corpus size — the 100 TB cost is
    * the single fingerprint scan. */
  val qSourceOverlap = Q(
    "q_source_overlap",
    (s, dir) => {
      val sb = Tables.documents(s, dir)
        .select(col("source"),
          graft.operators.TextDedup.simhashCol(col("text"), 16).as("b"))
        .distinct()
      val a = sb.select(col("b"), col("source").as("a_src"))
      val bb = sb.select(col("b"), col("source").as("b_src"))
      a.join(bb, Seq("b"))
        .where(col("a_src") < col("b_src"))
        .groupBy("a_src", "b_src")
        .agg(count(lit(1)).as("shared_buckets"))
        .orderBy(col("shared_buckets").desc, col("a_src"), col("b_src"))
        .limit(20)
    },
    Some {
      val sh = T.sqlSimhash(s"list_distinct(${T.sqlTokens("text")})", 16)
      s"""WITH sb AS (SELECT DISTINCT source, $sh AS b FROM documents)
          SELECT a.source AS a_src, b.source AS b_src,
                 CAST(count(*) AS BIGINT) AS shared_buckets
          FROM sb a JOIN sb b ON a.b = b.b AND a.source < b.source
          GROUP BY 1, 2 ORDER BY shared_buckets DESC, a_src, b_src LIMIT 20"""
    })

  /** INCREMENTAL dedup admission — the shape a production corpus runs
    * daily: a new batch (the top 20% of doc_ids) is admitted only if it
    * is neither an exact duplicate (md5) nor a near duplicate (occupied
    * 16-bit SimHash bucket) of the existing corpus (the bottom 80%).
    * Per-lang tally of exact-rejected / near-rejected / admitted.
    *
    * Scale shape: the split point is a one-row broadcast aggregate (no
    * driver-side collect), and both membership probes are equi-joins on
    * HASHES — at 100 TB the corpus side ships (md5, bucket) keys, never
    * text, and the batch side is the small relation. Exact-dup flags
    * take precedence in the tally (near counts only !exact), so the
    * three buckets partition the batch. */
  val qDedupIncremental = Q(
    "q_dedup_incremental",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          md5(col("text").cast("binary")).as("h"),
          graft.operators.TextDedup.simhashCol(col("text"), 16).as("sh"))
      val split = d.agg(((max("doc_id") + 1) * 0.8).cast("long").as("split"))
      val dd = d.crossJoin(broadcast(split))
      val corpus = dd.where(col("doc_id") < col("split"))
      val batch = dd.where(col("doc_id") >= col("split"))
      val exact = corpus.select(col("h").as("ch")).distinct()
      val near = corpus.select(col("sh").as("csh")).distinct()
      val flagged = batch
        .join(exact, batch("h") === exact("ch"), "left_outer")
        .join(near, batch("sh") === near("csh"), "left_outer")
        .select(col("lang"), col("ch").isNotNull.as("e"), col("csh").isNotNull.as("nr"))
      flagged.groupBy("lang")
        .agg(count(lit(1)).as("n_new"),
          sum(when(col("e"), 1L).otherwise(0L)).as("n_exact_rej"),
          sum(when(!col("e") && col("nr"), 1L).otherwise(0L)).as("n_near_rej"),
          sum(when(!col("e") && !col("nr"), 1L).otherwise(0L)).as("n_admitted"))
        .orderBy("lang")
    },
    Some {
      val sh = T.sqlSimhash(s"list_distinct(${T.sqlTokens("text")})", 16)
      s"""WITH d AS (SELECT doc_id, lang, md5(text) AS h, $sh AS sh FROM documents),
               s AS (SELECT CAST((max(doc_id) + 1) * 0.8 AS BIGINT) AS split FROM d),
               corpus AS (SELECT d.* FROM d, s WHERE doc_id < split),
               batch AS (SELECT d.* FROM d, s WHERE doc_id >= split),
               f AS (SELECT b.lang,
                            EXISTS (SELECT 1 FROM corpus c WHERE c.h = b.h) AS e,
                            EXISTS (SELECT 1 FROM corpus c WHERE c.sh = b.sh) AS nr
                     FROM batch b)
          SELECT lang, CAST(count(*) AS BIGINT) AS n_new,
                 CAST(sum(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_rej,
                 CAST(sum(CASE WHEN NOT e AND nr THEN 1 ELSE 0 END) AS BIGINT) AS n_near_rej,
                 CAST(sum(CASE WHEN NOT e AND NOT nr THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted
          FROM f GROUP BY lang ORDER BY lang"""
    })

  /** Exact-substring pair dedup (the Lee et al. 2022 granularity): two
    * documents sharing an 8-token window contain a verbatim 8-token
    * copy; the count of shared distinct windows per pair ranks
    * pair-level verbatim overlap — the complement of q_boilerplate
    * (corpus-wide phrase fraction per doc) and q_minhash_lsh
    * (set-similarity estimate): this one localizes WHO copied a long
    * span from WHOM. Scale guards: only 60-bit window hashes cross the
    * shuffle (fused one-pass kernel), and the pair join runs over
    * windows appearing in 2..10 docs — singletons cannot pair and a
    * hotter window is boilerplate (q_boilerplate's beat), so per-hash
    * fan-out is capped at C(10,2). */
  val qSubstringDup = Q(
    "q_substring_dup",
    (s, dir) => {
      // materialized once: the (doc, window-hash) table feeds BOTH the
      // frequency aggregate and the pair join — without the cut the
      // 8-token shingle kernel runs twice over the corpus (the same
      // double-evaluation q_boilerplate's pair table had)
      val wh = Tables.documents(s, dir)
        .select(col("doc_id"), explode(T.shingleHashes60(col("text"), 8)).as("h"))
        .transform(graft.operators.Materialize.cut(_))
      val freq = wh.groupBy("h").agg(count(lit(1)).as("nd"))
        .where(col("nd").between(2, 10))
        .select("h")
      val c = wh.join(freq, Seq("h"))
      val a = c.select(col("h"), col("doc_id").as("a_id"))
      val b = c.select(col("h").as("bh"), col("doc_id").as("b_id"))
      a.join(b, col("h") === col("bh") && col("a_id") < col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(count(lit(1)).as("shared_windows"))
        .orderBy(col("shared_windows").desc, col("a_id"), col("b_id"))
        .limit(20)
    },
    Some {
      val g = T.sqlShingleHashes60("text", 8)
      s"""WITH wh AS (SELECT doc_id, unnest($g) AS h FROM documents),
               freq AS (SELECT h FROM wh GROUP BY h HAVING count(*) BETWEEN 2 AND 10),
               c AS (SELECT wh.doc_id, wh.h FROM wh JOIN freq USING (h))
          SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                 CAST(count(*) AS BIGINT) AS shared_windows
          FROM c a JOIN c b ON a.h = b.h AND a.doc_id < b.doc_id
          GROUP BY 1, 2 ORDER BY shared_windows DESC, a_id, b_id LIMIT 20"""
    })

  /** Sketch-ROUTED corpus admission — the batch face of
    * [[graft.streaming.DedupStreaming.corpusGate]], oracle-paired: same
    * 80/20 corpus/batch split as q_dedup_incremental, but the batch is
    * gated through the bloom-sketch router (definite-novel docs
    * admitted map-side with no join; only sketch hits take the exact
    * anti-joins). The bloom is pure routing, so the admitted id list
    * hash-matches an oracle that knows nothing about sketches — which
    * is the whole point: the scale path must be invisible in the
    * answer. */
  val qAdmitSketch = Q(
    "q_admit_sketch",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val split = d.agg(((max("doc_id") + 1) * 0.8).cast("long").as("split"))
      val dd = d.crossJoin(broadcast(split))
      val corpus = dd.where(col("doc_id") < col("split")).select("text")
      val batch = dd.where(col("doc_id") >= col("split")).select("doc_id", "text")
      graft.streaming.DedupStreaming
        .corpusGate(corpus, estItems = 200000L, numBits = 2097152L)
        .admitBatch(batch)
        .select("doc_id")
        .orderBy("doc_id")
    },
    Some {
      val sh = T.sqlSimhash(s"list_distinct(${T.sqlTokens("text")})", 16)
      s"""WITH d AS (SELECT doc_id, md5(text) AS h, $sh AS sh FROM documents),
               s AS (SELECT CAST((max(doc_id) + 1) * 0.8 AS BIGINT) AS split FROM d),
               corpus AS (SELECT d.* FROM d, s WHERE doc_id < split),
               batch AS (SELECT d.* FROM d, s WHERE doc_id >= split)
          SELECT b.doc_id FROM batch b
          WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.h = b.h)
            AND NOT EXISTS (SELECT 1 FROM corpus c WHERE c.sh = b.sh)
          ORDER BY doc_id"""
    })

  def all: Seq[Q] = Seq(qDedupExact, qMinhashLsh, qDedupClusters, qSimhash,
    qNgramJaccard, qContainment, qFingerprint, qDedupKeepBest,
    qSourceOverlap, qDedupIncremental, qSubstringDup, qAdmitSketch)
}
