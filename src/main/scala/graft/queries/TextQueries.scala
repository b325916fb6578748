package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextFunctions => T}

/** Text-analysis operators over `documents`: language-ID (marker-token
  * heuristic), quality scoring, token counting (whitespace + regex).
  * All single-pass hash aggregates — map-side combinable, no joins. */
object TextQueries {

  /** Language-ID confusion matrix: labeled lang × predicted lang. */
  val qLangId = Q(
    "q_lang_id",
    (s, dir) => Tables.documents(s, dir)
      .select(col("lang"), T.predictedLang(T.tokens(col("text"))).as("predicted"))
      .groupBy("lang", "predicted")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted"),
    Some(s"""SELECT lang, ${T.sqlPredictedLang(T.sqlTokens("text"))} AS predicted,
                    CAST(count(*) AS BIGINT) AS n
             FROM documents GROUP BY 1, 2 ORDER BY lang, predicted"""))

  /** Per-source quality-score profile (composite heuristic in [0,1]). */
  val qQualityScore = Q(
    "q_quality_score",
    (s, dir) => Tables.documents(s, dir)
      .select(col("source"), round(T.qualityScore(col("text")), 6).as("q"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        round(sum(col("q").cast("decimal(18,6)")).cast("double") / count(lit(1)), 6).as("avg_q"),
        min("q").as("min_q"), max("q").as("max_q"))
      .orderBy("source"),
    Some(s"""SELECT source, CAST(count(*) AS BIGINT) AS n,
                    round(CAST(sum(CAST(q AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_q,
                    min(q) AS min_q, max(q) AS max_q
             FROM (SELECT source, round(${T.sqlQualityScore("text")}, 6) AS q FROM documents)
             GROUP BY source ORDER BY source"""))

  /** Token counting: whitespace tokens, regex word tokens ([a-z0-9]+),
    * and distinct word-token count, summed per lang. */
  val qTokenStats = Q(
    "q_token_stats",
    (s, dir) => Tables.documents(s, dir)
      .select(col("lang"),
        size(T.tokens(col("text"))).as("ws"),
        size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0))).as("re"),
        size(array_distinct(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)))).as("uniq"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("ws").as("n_ws_tokens"),
        sum("re").as("n_re_tokens"),
        sum("uniq").as("n_uniq_tokens"))
      .orderBy("lang"),
    Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_ws_tokens,
                   CAST(sum(len(regexp_extract_all(text, '[a-z0-9]+'))) AS BIGINT) AS n_re_tokens,
                   CAST(sum(len(list_distinct(regexp_extract_all(text, '[a-z0-9]+')))) AS BIGINT) AS n_uniq_tokens
            FROM documents GROUP BY lang ORDER BY lang"""))

  /** Repetition detection — the duplicated-token quality signal used by
    * large-corpus filters: per doc, 1 − distinct/total whitespace
    * tokens; profiled per source with a heavy-repetition count. One
    * scan, map-side expression, hash aggregate. */
  val qRepetition = Q(
    "q_repetition",
    (s, dir) => Tables.documents(s, dir)
      .select(col("source"),
        round(lit(1.0) -
          size(array_distinct(T.tokens(col("text")))).cast("double") /
          size(T.tokens(col("text"))).cast("double"), 6).as("rep"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        // rep is pre-rounded: sum exactly in decimal, divide once
        round(sum(col("rep").cast("decimal(18,6)")).cast("double") / count(lit(1)), 6).as("avg_rep"),
        max("rep").as("max_rep"),
        sum(when(col("rep") > 0.5, 1L).otherwise(0L)).as("n_heavy"))
      .orderBy("source"),
    Some("""SELECT source, CAST(count(*) AS BIGINT) AS n,
                   round(CAST(sum(CAST(rep AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_rep,
                   max(rep) AS max_rep,
                   CAST(sum(CASE WHEN rep > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_heavy
            FROM (SELECT source,
                         round(1.0 - len(list_distinct(string_split(text, ' ')))::DOUBLE /
                               len(string_split(text, ' '))::DOUBLE, 6) AS rep
                  FROM documents)
            GROUP BY source ORDER BY source"""))

  /** approx_count_distinct (HLL++) vs exact distinct per lang. No DuckDB
    * oracle — HLL sketch implementations differ across engines, so the
    * driver records a rows-only check; the exact column is covered by
    * q_text_stats and the relative-error bound is asserted in tests. */
  /** Lexical-rarity quality signal: rank the corpus vocabulary by
    * frequency (1 = most common), score each document by its tokens'
    * mean rank, surface the 20 rarest-vocabulary documents. The rank
    * table is vocabulary-sized — BROADCAST — so scoring is one corpus
    * scan + explode; all arithmetic is integral until the final mean
    * (exact ints < 2^53 → identical doubles cross-engine). The
    * integer-safe stand-in for model-perplexity quality filters (no
    * cross-engine `log` ulp hazards). */
  val qRarityScore = Q(
    "q_rarity_score",
    (s, dir) => {
      val tok = Tables.documents(s, dir)
        .select(col("doc_id"), explode(T.tokens(col("text"))).as("w"))
      val rankW = org.apache.spark.sql.expressions.Window
        .orderBy(col("c").desc, col("w"))
      val vocabRank = tok.groupBy("w").agg(count(lit(1)).as("c"))
        .withColumn("rank", row_number().over(rankW).cast("long"))
        .select("w", "rank")
      tok.join(broadcast(vocabRank), Seq("w"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          round(sum("rank").cast("double") / count(lit(1)), 6).as("avg_rank"),
          max("rank").as("max_rank"))
        .orderBy(col("avg_rank").desc, col("doc_id"))
        .limit(20)
    },
    Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
            v AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
            r AS (SELECT w, CAST(row_number() OVER (ORDER BY c DESC, w) AS BIGINT) AS rank FROM v)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                   round(CAST(sum(rank) AS DOUBLE) / count(*), 6) AS avg_rank,
                   CAST(max(rank) AS BIGINT) AS max_rank
            FROM tok JOIN r USING (w)
            GROUP BY doc_id ORDER BY avg_rank DESC, doc_id LIMIT 20"""))

  /** PII redaction audit: mask numeric identifiers in the event payload
    * (`props`), report per event_type how many payloads were touched and
    * how many tokens were masked. Pure map-side regexp expressions — a
    * 100 TB scrub is one scan-and-rewrite pass, and this is its audit
    * aggregate. The regex stays in the dialect-common subset (`[0-9]+`)
    * so Java (Spark) and RE2 (DuckDB) agree; DuckDB needs the 'g' flag
    * to match Spark's replace-all default. */
  val qPiiScrub = Q(
    "q_pii_scrub",
    (s, dir) => {
      val masked = regexp_replace(col("props"), "[0-9]+", "#")
      Tables.events(s, dir)
        .select(col("event_type"), col("props"), masked.as("masked"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("masked") =!= col("props"), 1L).otherwise(0L)).as("n_redacted"),
          sum(regexp_count(col("props"), lit("[0-9]+")).cast("long")).as("n_hits"),
          min("masked").as("sample_masked"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN regexp_replace(props, '[0-9]+', '#', 'g') <> props
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_redacted,
                   CAST(sum(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT) AS n_hits,
                   min(regexp_replace(props, '[0-9]+', '#', 'g')) AS sample_masked
            FROM events GROUP BY event_type ORDER BY event_type"""))

  /** HLL++ approximate distinct per lang, ORACLE-CHECKED through a
    * tolerance boolean: the raw sketch value is engine-specific (DuckDB
    * cannot reproduce Spark's HLL bits), but `within_tol` — relative
    * error against the exact count under 8%, four sigma at rsd 0.02 —
    * is a fact both engines agree on, so the row hashes. A sketch that
    * drifts past the bound fails the driver compare instead of hiding
    * behind a rows-only check (this key was no-oracle for 11 rounds;
    * its value-exact twin is q_kmv_distinct). */
  val qApproxDistinct = Q(
    "q_approx_distinct",
    (s, dir) => Tables.documents(s, dir)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        countDistinct("text").as("exact_distinct"),
        approx_count_distinct("text", 0.02).as("approx_distinct"))
      .select(col("lang"), col("n"), col("exact_distinct"),
        (abs(col("approx_distinct").cast("double") -
             col("exact_distinct").cast("double")) <=
          lit(0.08) * col("exact_distinct").cast("double"))
          .as("within_tol"))
      .orderBy("lang"),
    Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n,
                   CAST(count(DISTINCT text) AS BIGINT) AS exact_distinct,
                   TRUE AS within_tol
            FROM documents GROUP BY lang ORDER BY lang"""))

  /** Token co-occurrence over the top-50 vocabulary: which frequent
    * terms appear in the SAME documents — the association table behind
    * topic/domain drift checks and embedding sanity audits. The pair
    * space is bounded by construction: tokens are first semi-joined to
    * a broadcast top-50 vocab, so each document contributes at most
    * C(50,2) pairs regardless of its length — the per-doc self-join
    * can never go quadratic in document size at any corpus scale. */
  val qCooccur = Q(
    "q_cooccur",
    (s, dir) => {
      // tokenize ONCE (lineage cut): the tokens feed both the vocab agg
      // and pair generation, and without the cut the regexp scan ran 3×
      // (vocab + both sides of a doc_id self-join — guide §2.4)
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(array_distinct(
            regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)))).as("token"))
        .transform(graft.operators.Materialize.cut(_))
      val top = toks.groupBy("token").agg(count(lit(1)).as("tf"))
        .orderBy(col("tf").desc, col("token")).limit(50)
        .select("token")
      val t = toks.join(broadcast(top), Seq("token"))
      val x = t.select(col("doc_id"), col("token").as("t1"))
      val y = t.select(col("doc_id"), col("token").as("t2"))
      x.join(y, Seq("doc_id"))
        .where(col("t1") < col("t2"))
        .groupBy("t1", "t2")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("n_docs").desc, col("t1"), col("t2"))
        .limit(20)
    },
    Some("""WITH toks AS (SELECT DISTINCT doc_id,
                            unnest(regexp_extract_all(text, '[a-z0-9]+')) AS token
                          FROM documents),
                 top AS (SELECT token FROM toks
                         GROUP BY token
                         ORDER BY count(*) DESC, token LIMIT 50),
                 t AS (SELECT doc_id, token FROM toks SEMI JOIN top USING (token))
            SELECT a.token AS t1, b.token AS t2, CAST(count(*) AS BIGINT) AS n_docs
            FROM t a JOIN t b ON a.doc_id = b.doc_id AND a.token < b.token
            GROUP BY t1, t2 ORDER BY n_docs DESC, t1, t2 LIMIT 20"""))

  /** Cross-doc repeated-phrase (boilerplate) audit — the cleanup step
    * between doc-level dedup and quality filtering: a 3-gram phrase
    * appearing in ≥ 3 distinct documents is boilerplate (headers,
    * footers, license blurbs), and a document is ranked by the fraction
    * of its distinct phrases that are boilerplate. Shape: one fused
    * shingle pass exploding distinct 3-gram hashes (60-bit ints — no
    * phrase strings cross the shuffle), a map-side-combinable hash agg
    * for corpus phrase frequency, an equi-join back, a per-doc agg —
    * the q_decontaminate posture; AQE broadcasts the frequency side
    * when it fits. Integer counts, one final IEEE division.
    *
    * The (doc_id, h) pair table feeds BOTH the frequency agg and the
    * join probe; materializing it once (localCheckpoint) halves the
    * shingle+md5 work — the q_centroid_sim scan-once pattern. The
    * shingle→distinct→h60 walk is one fused kernel pass
    * ([[graft.expressions.ShingleHash60Expr]]): the composed
    * `h60(explode(array_distinct(shingles(...))))` form walked an
    * interpreted transform lambda per gram and ran 7.6 s at sf0.1. */
  val qBoilerplate = Q(
    "q_boilerplate",
    (s, dir) => {
      val pairs = Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(T.shingleHashes60(col("text"), 3)).as("h"))
        .transform(graft.operators.Materialize.cut(_))
      val freq = pairs.groupBy("h").agg(count(lit(1)).as("nd"))
      pairs.join(freq, Seq("h"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("nd") >= 3, 1L).otherwise(0L)).as("n_boiler"))
        .withColumn("boiler_frac",
          round(col("n_boiler").cast("double") / col("n_grams"), 6))
        .orderBy(col("boiler_frac").desc, col("doc_id"))
        .limit(20)
    },
    Some {
      val sh = T.sqlShingles("text", 3)
      s"""WITH p AS (SELECT doc_id, ${T.sqlH60("g")} AS h
                     FROM (SELECT doc_id, unnest(list_distinct($sh)) AS g FROM documents)),
               f AS (SELECT h, count(*) AS nd FROM p GROUP BY h)
          SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                 CAST(sum(CASE WHEN f.nd >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
                 round(sum(CASE WHEN f.nd >= 3 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) AS boiler_frac
          FROM p JOIN f USING (h)
          GROUP BY p.doc_id
          ORDER BY boiler_frac DESC, doc_id LIMIT 20"""
    })

  /** Approximate distinct count via a PORTABLE bottom-k (KMV) sketch —
    * the oracle-PAIRED complement of q_approx_distinct (whose native
    * HLL bits are engine-specific, hence rows-only forever): keep the
    * k=64 smallest distinct h60(text) values per group with the
    * bounded-heap [[graft.expressions.TopKAggregate]] (map-side
    * combinable, O(k) state per group at any corpus size), estimate
    * distinct = (k−1)·2^60 / kth_min, exact when fewer than k values
    * were seen (the KMV convention). The heap orders by
    * (double(h), h) — the long tiebreak restores exactness past 2^53 —
    * so the k-th value matches DuckDB's exact integer sort and the
    * estimator hash-matches cross-engine: a SKETCH with an exact-sort
    * oracle. */
  val qKmvDistinct = Q(
    "q_kmv_distinct",
    (s, dir) => {
      val K = 64
      val d = Tables.documents(s, dir)
        .select(col("lang"), T.h60(col("text")).as("h")).distinct()
      d.groupBy("lang")
        .agg(countDistinct(col("h")).as("n_exact"),
          graft.expressions.TopKAggregate
            .topK(struct(col("h").cast("double").as("dist"), col("h").as("id")), K)
            .as("top"))
        .select(col("lang"), col("n_exact"),
          round(when(size(col("top")) < K, size(col("top")).cast("double"))
            .otherwise(lit(63.0) * lit(1152921504606846976.0) /
              element_at(col("top"), K).getField("id").cast("double")), 6)
            .as("kmv_estimate"))
        .orderBy("lang")
    },
    Some {
      val h = T.sqlH60("text")
      s"""WITH d AS (SELECT DISTINCT lang, $h AS h FROM documents),
               g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_exact,
                            list_sort(list(h)) AS hs
                     FROM d GROUP BY lang)
          SELECT lang, n_exact,
                 round(CASE WHEN len(hs) < 64 THEN len(hs)::DOUBLE
                            ELSE 63.0 * 1152921504606846976.0 / hs[64]::DOUBLE END, 6)
                   AS kmv_estimate
          FROM g ORDER BY lang"""
    })

  /** MISRA-GRIES heavy hitters ([[graft.expressions.HeavyHittersAggregate]])
    * over (source, lang) — frequent-items WITHOUT shuffling the key
    * universe: the typed aggregate is map-side combinable, so each
    * input partition ships at most `capacity` counters into the
    * shuffle (top domains over 100 TB cost capacity × partitions wire
    * bytes; the exact groupBy this oracle runs shuffles every distinct
    * key). Capacity 128 exceeds the fixture's ~100 distinct pairs at
    * every SF, so the sketch runs in its EXACT regime (zero reductions
    * anywhere, err = 0 — the scaladoc guarantee) and the counts
    * hash-match the exact GROUP BY; the N/(capacity+1) error bound on
    * overflowing data is HeavyHittersSpec's job. */
  val qHeavyHitters = Q(
    "q_heavy_hitters",
    (s, dir) => Tables.documents(s, dir)
      .agg(graft.expressions.HeavyHittersAggregate.heavyHitters(
        concat(col("source"), lit(":"), col("lang")), 128).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.key").as("key"), col("h.cnt").as("cnt"),
        col("h.err").as("err"))
      .orderBy(desc("cnt"), asc("key")),
    Some("""SELECT source || ':' || lang AS key,
                   CAST(count(*) AS BIGINT) AS cnt,
                   CAST(0 AS BIGINT) AS err
            FROM documents GROUP BY 1 ORDER BY cnt DESC, key"""))

  /** The Misra-Gries sketch in its REDUCTION regime — capacity 32
    * under ~100 distinct keys, so decrements fire in updates AND
    * merges — audited through its THEOREMS, which hold regardless of
    * partition layout or merge order (the reported key SET is
    * layout-dependent; the guarantees are not, so they are what an
    * oracle can check):
    *   - bounds_hold: stored ≤ exact ≤ stored + err for every
    *     reported key (exact recomputed by a plain groupBy),
    *   - err_bound_holds: err ≤ N / (capacity + 1),
    *   - recall_holds: every key with exact > N / (capacity + 1) is
    *     reported (true count minus stored never exceeds err, so such
    *     a key's counter is positive).
    * DuckDB asserts all three TRUE plus the exact row total — a
    * hash-green run proves the sketch honored its contract on this
    * data at this scale, not just in HeavyHittersSpec's fixture. The
    * exact sides are one groupBy + one-row broadcast aggregates; the
    * sketch side ships ≤ capacity counters per partition. */
  val qHhSketchBound = Q(
    "q_hh_sketch_bound",
    (s, dir) => {
      val K = 32
      val docs = Tables.documents(s, dir)
        .select(concat(col("source"), lit(":"), col("lang")).as("key"))
      val sk = docs
        .agg(graft.expressions.HeavyHittersAggregate.heavyHitters(
          col("key"), K).as("hh"))
        .select(explode(col("hh")).as("h"))
        .select(col("h.key").as("key"), col("h.cnt").as("cnt"),
          col("h.err").as("err"))
      val exact = docs.groupBy("key").agg(count(lit(1)).as("exact"))
      val tot = docs.agg(count(lit(1)).as("n"))
      val bound = col("n").cast("double") / lit(K + 1)
      val checks = sk.join(exact, Seq("key"))
        .crossJoin(broadcast(tot))
        .agg(
          coalesce(min(col("cnt") <= col("exact") &&
            col("exact") <= col("cnt") + col("err")), lit(true))
            .as("bounds_hold"),
          coalesce(min(col("err").cast("double") <= bound), lit(true))
            .as("err_bound_holds"))
      val missed = exact.crossJoin(broadcast(tot))
        .where(col("exact").cast("double") > bound)
        .join(sk.select("key"), Seq("key"), "left_anti")
        .agg(count(lit(1)).as("n_missed"))
      checks.crossJoin(missed).crossJoin(broadcast(tot))
        .select(col("bounds_hold"), col("err_bound_holds"),
          (col("n_missed") === 0L).as("recall_holds"), col("n"))
    },
    Some("""SELECT TRUE AS bounds_hold, TRUE AS err_bound_holds,
                   TRUE AS recall_holds, CAST(count(*) AS BIGINT) AS n
            FROM documents"""))

  def all: Seq[Q] = Seq(qLangId, qQualityScore, qTokenStats, qRepetition,
    qPiiScrub, qRarityScore, qApproxDistinct, qKmvDistinct, qCooccur,
    qBoilerplate, qHeavyHitters, qHhSketchBound)
}
