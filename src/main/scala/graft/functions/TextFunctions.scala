package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for training-data pipelines: tokenizing,
  * portable string hashing, shingling, MinHash, SimHash, rolling-hash
  * fingerprints, quality scoring, language markers.
  *
  * Everything is a pure Column expression (no UDFs — whole-stage codegen
  * end-to-end) with a paired DuckDB SQL generator so every operator is
  * oracle-checkable. The portable hash contract:
  *
  *   h60(s) = int64(first 15 hex chars of md5(utf8(s)))   // in [0, 2^60)
  *   h31(s) = h60(s) % 2147483647                          // mod-mult-safe
  *
  * identical in Spark (`conv(substring(md5(x),1,15),16,10)`) and DuckDB
  * (`('0x'||substring(md5(x),1,15))::BIGINT`), so MinHash/SimHash
  * signatures hash-match across engines. All composite arithmetic stays
  * in integers → no float-ordering hazards.
  */
object TextFunctions {
  val P31 = 2147483647L // 2^31 - 1; (a*h31 + b) stays < 2^62

  private def wrap(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.GraftShims.column(e)
  private def unwrap(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.GraftShims.expression(c)

  // ------------------------------------------------------ portable hash

  def h60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  def h31(c: Column): Column = h60(c) % P31

  def sqlH60(e: String): String =
    s"(('0x' || substring(md5($e), 1, 15))::BIGINT)"

  def sqlH31(e: String): String = s"(${sqlH60(e)} % $P31)"

  // ------------------------------------------------------- tokenization

  /** Whitespace tokens (single-space split — matches DuckDB
    * string_split(text, ' ') including empties on runs). */
  def tokens(c: Column): Column = split(c, " ")

  def sqlTokens(e: String): String = s"string_split($e, ' ')"

  /** Word n-gram shingles, space-joined (guarded: <n tokens → []). */
  def shingles(c: Column, n: Int): Column = {
    val t = tokens(c)
    when(size(t) >= n,
      transform(sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(t, i + o)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  def sqlShingles(e: String, n: Int): String = {
    val toks = sqlTokens(e)
    val parts = (0 until n).map(o => s"($toks)[i + $o]").mkString(" || ' ' || ")
    s"list_transform(generate_series(1, len($toks) - ${n - 1}), i -> $parts)"
  }

  /** Character n-grams of a string (for n-gram Jaccard dedup). */
  def charNgrams(c: Column, n: Int): Column =
    when(length(c) >= n,
      transform(sequence(lit(1), length(c) - (n - 1)), i => substring(c, lit(i), lit(n))))
      .otherwise(array().cast("array<string>"))

  def sqlCharNgrams(e: String, n: Int): String =
    s"list_transform(generate_series(1, length($e) - ${n - 1}), i -> substring($e, i, $n))"

  /** Distinct char n-grams hashed to h60, fused
    * ([[graft.expressions.CharNgramHash60Expr]]) — integer Jaccard sets. */
  def charNgramHashes(text: Column, n: Int): Column =
    wrap(graft.expressions.CharNgramHash60Expr(unwrap(text.cast("string")), n))

  /** Oracle mirror of [[charNgramHashes]]. */
  def sqlCharNgramHashes(e: String, n: Int): String =
    s"list_transform(list_distinct(${sqlCharNgrams(e, n)}), s -> ${sqlH60("s")})"

  /** Distinct word-n-gram shingles hashed to h60, fused
    * ([[graft.expressions.ShingleHash60Expr]]) — the equality-only twin
    * of the MinHash path's 31-bit shingle kernel. */
  def shingleHashes60(text: Column, n: Int): Column =
    wrap(graft.expressions.ShingleHash60Expr(unwrap(text.cast("string")), n))

  /** Oracle mirror of [[shingleHashes60]]. */
  def sqlShingleHashes60(e: String, n: Int): String =
    s"list_transform(list_distinct(${sqlShingles(e, n)}), s -> ${sqlH60("s")})"

  // ----------------------------------------------------------- MinHash

  /** Seeded (a, b) parameters for the universal-hash family
    * h_j(x) = (a_j·h31(x) + b_j) mod P31. */
  def minhashParams(k: Int, seed: Long = 13L): Seq[(Long, Long)] = {
    val rng = new java.util.Random(seed)
    Seq.fill(k)((1L + rng.nextInt(Int.MaxValue - 1).toLong,
      rng.nextInt(Int.MaxValue).toLong))
  }

  /** h31 of every element of a string-set column — materialize this ONCE
    * (withColumn) and feed the *FromHashes variants below. Fused native
    * kernel ([[graft.expressions.Hashes31Expr]]): `transform`'s lambda
    * is interpreted per element in Spark, and the md5→hex→`conv` chain
    * walked that way dominated the dedup family's runtime. Bit-identical
    * to [[hashes31Hof]] (equivalence-tested). */
  def hashes31(set: Column): Column =
    wrap(graft.expressions.Hashes31Expr(unwrap(set.cast("array<string>"))))

  /** HOF formulation of [[hashes31]] (equivalence-test twin / the
    * no-custom-expression fallback). */
  def hashes31Hof(set: Column): Column = transform(set, x => h31(x))

  /** Fused `hashes31(array_distinct(shingles(text, n)))` in one kernel
    * pass ([[graft.expressions.ShingleHash31Expr]]) — shingling through
    * interpreted HOF lambdas dominated the MinHash pipeline. */
  def shingleHashes(text: Column, n: Int): Column =
    wrap(graft.expressions.ShingleHash31Expr(unwrap(text.cast("string")), n))

  /** Whole k-element MinHash signature as ONE array column in one pass
    * over the hash set ([[graft.expressions.MinhashSigExpr]]) — the
    * fused form of [[minhashSigFromHashes]]'s k interpreted array walks. */
  def minhashSigArr(hs: Column, params: Seq[(Long, Long)]): Column =
    wrap(graft.expressions.MinhashSigExpr(unwrap(hs),
      params.map(_._1), params.map(_._2)))

  /** k separate signature columns from a pre-hashed set — HOF twin of
    * [[minhashSigArr]] (equivalence-tested). */
  def minhashSigFromHashes(hs: Column, params: Seq[(Long, Long)]): Seq[Column] =
    params.map { case (a, b) =>
      array_min(transform(hs, x => (lit(a) * x + lit(b)) % P31))
    }

  /** k-element MinHash signature of a (distinct) shingle set column. */
  def minhashSig(shingleSet: Column, params: Seq[(Long, Long)]): Seq[Column] =
    minhashSigFromHashes(hashes31(shingleSet), params)

  def sqlMinhashSig(setExpr: String, params: Seq[(Long, Long)]): Seq[String] =
    params.map { case (a, b) =>
      s"list_min(list_transform($setExpr, s -> ($a * ${sqlH31("s")} + $b) % $P31))"
    }

  /** SQL mirror of [[minhashSigFromHashes]] — input is already a BIGINT
    * hash list, so the per-term work is arithmetic only. */
  def sqlMinhashSigFromHashes(hsExpr: String, params: Seq[(Long, Long)]): Seq[String] =
    params.map { case (a, b) =>
      s"list_min(list_transform($hsExpr, x -> ($a * x + $b) % $P31))"
    }

  // ----------------------------------------------------------- SimHash

  /** `bits`-bit SimHash from a pre-hashed token set: bit k of the
    * fingerprint is 1 iff (#tokens with bit k set) > (#without). Fused
    * one-pass kernel ([[graft.expressions.SimhashExpr]]) — the HOF form
    * walks the array `bits` times with an interpreted lambda each. */
  def simhashFromHashes(hs: Column, bits: Int): Column =
    wrap(graft.expressions.SimhashExpr(unwrap(hs), bits))

  /** HOF formulation of [[simhashFromHashes]] (equivalence-test twin):
    * 2·|filter| − |set| > 0 per bit, pure integer ops. */
  def simhashFromHashesHof(hs: Column, bits: Int): Column =
    (0 until bits).map { k =>
      val ones = size(filter(hs, x => shiftright(x, k) % 2 === 1))
      when(ones * 2 > size(hs), lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** `bits`-bit SimHash over a token-set column. Prefer materializing
    * [[hashes31]] first and calling [[simhashFromHashes]]. */
  def simhash(tokenSet: Column, bits: Int): Column =
    simhashFromHashes(hashes31(tokenSet), bits)

  def sqlSimhash(setExpr: String, bits: Int): String =
    (0 until bits).map { k =>
      s"(CASE WHEN 2 * len(list_filter($setExpr, t -> (${sqlH31("t")} >> $k) & 1 = 1)) > len($setExpr) THEN ${1L << k} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  // ------------------------------------------------------- fingerprint

  /** Polynomial rolling-hash fingerprint of the whole document:
    * fold chars left-to-right: h ← (h·31 + ascii(c)) mod 1e9+7. */
  val FpMod = 1000000007L

  /** Fused one-pass kernel ([[graft.expressions.FingerprintExpr]]);
    * [[fingerprintHof]] is the equivalence-tested HOF twin. */
  def fingerprint(c: Column): Column =
    wrap(graft.expressions.FingerprintExpr(unwrap(c.cast("string"))))

  def fingerprintHof(c: Column): Column =
    aggregate(transform(split(c, ""), ch => ascii(ch).cast("long")),
      lit(0L), (acc, x) => (acc * 31L + x) % FpMod)

  def sqlFingerprint(e: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(string_split($e, ''), c -> ascii(c)::BIGINT)), (a, b) -> (a * 31 + b) % $FpMod)"

  // ---------------------------------------------------------- language

  /** Tiny stopword marker sets per language (public common function
    * words), for n-gram-heuristic language ID. Preference order on ties:
    * en > de > es > fr (deterministic CASE chain, mirrored in SQL). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "und", "die", "das", "ist"),
    "es" -> Seq("el", "la", "los", "que", "es"),
    "fr" -> Seq("le", "les", "et", "que", "est"))

  /** Marker-word occurrences — fused hash-set membership kernel
    * ([[graft.expressions.MarkerCountExpr]]); [[markerCountHof]] is the
    * equivalence-tested HOF twin. */
  def markerCount(toks: Column, words: Seq[String]): Column =
    wrap(graft.expressions.MarkerCountExpr(
      unwrap(toks.cast("array<string>")), words))

  def markerCountHof(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))

  def sqlMarkerCount(toksExpr: String, words: Seq[String]): String = {
    val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter($toksExpr, t -> list_contains($lst, t)))"
  }

  /** BM25 per-term score (k1=1.2, b=0.75) with the LINEAR idf `N/df` —
    * float `ln` is not bit-portable cross-engine (the q_tfidf rule).
    * tf runs through the fused marker-count kernel; `n`/`sumdl`/`df`
    * are the corpus-stat columns (exact integers, usually from a
    * one-row broadcast aggregate). A term absent from the corpus
    * contributes 0 — the unguarded formula is 0·∞ = NaN for every row.
    * The ONE formula shared by q_hybrid_rrf and `Lake.hybridSearch`. */
  def bm25TermScore(tk: Column, term: String,
      n: Column, sumdl: Column, df: Column): Column = {
    val tf = markerCount(tk, Seq(term)).cast("double")
    val dl = size(tk).cast("double")
    val avgdl = sumdl.cast("double") / n.cast("double")
    when(df === 0L, lit(0.0)).otherwise(
      tf * lit(2.2) / (tf + lit(1.2) * (lit(0.25) + lit(0.75) * dl / avgdl)) *
        (n.cast("double") / df.cast("double")))
  }

  /** Predicted language by marker-count argmax with fixed tie order. */
  def predictedLang(toks: Column): Column = {
    val scores = langMarkers.map { case (l, ws) => l -> markerCount(toks, ws) }
    scores.init.zipWithIndex.foldRight(lit(scores.last._1): Column) {
      case (((lang, s), i), rest) =>
        val laterScores = scores.drop(i + 1).map(_._2)
        when(laterScores.map(o => s >= o).reduce(_ && _), lit(lang)).otherwise(rest)
    }
  }

  def sqlPredictedLang(toksExpr: String): String = {
    val scores = langMarkers.map { case (l, ws) => l -> sqlMarkerCount(toksExpr, ws) }
    val cases = scores.init.zipWithIndex.map { case ((lang, s), i) =>
      val cond = scores.drop(i + 1).map(o => s"$s >= ${o._2}").mkString(" AND ")
      s"WHEN $cond THEN '$lang'"
    }
    s"(CASE ${cases.mkString(" ")} ELSE '${scores.last._1}' END)"
  }

  // ----------------------------------------------------------- quality

  /** Composite quality score in [0,1]: token-count saturation,
    * letter-character ratio, marker-stopword ratio, mean word length
    * band. Pure arithmetic, mirrored in SQL; callers round(…,6). */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val lenC = length(text).cast("double")
    val letters = length(regexp_replace(text, "[^a-z]", "")).cast("double")
    val stop = markerCount(toks, langMarkers.flatMap(_._2)).cast("double")
    val avgWl = (lenC - (n - 1)) / n
    val score = least(n / 60.0, lit(1.0)) * 0.4 +
      (letters / lenC) * 0.3 +
      least(stop / n * 10.0, lit(1.0)) * 0.2 +
      when(avgWl >= 3.0 && avgWl <= 8.0, 0.1).otherwise(0.0)
    // empty docs score 0 (ANSI mode would otherwise raise DIVIDE_BY_ZERO)
    when(lenC === 0.0, 0.0).otherwise(score)
  }

  def sqlQualityScore(e: String): String = {
    val toks = sqlTokens(e)
    val stop = sqlMarkerCount(toks, langMarkers.flatMap(_._2))
    s"""(CASE WHEN length($e) = 0 THEN 0.0 ELSE
        (least(len($toks)::DOUBLE / 60.0, 1.0) * 0.4
       + (length(regexp_replace($e, '[^a-z]', '', 'g'))::DOUBLE / length($e)::DOUBLE) * 0.3
       + least($stop::DOUBLE / len($toks)::DOUBLE * 10.0, 1.0) * 0.2
       + (CASE WHEN (length($e)::DOUBLE - (len($toks)::DOUBLE - 1)) / len($toks)::DOUBLE BETWEEN 3.0 AND 8.0 THEN 0.1 ELSE 0.0 END)) END)"""
  }
}
