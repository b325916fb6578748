package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Lsh, TextFunctions => T, VectorFunctions => V}

/** The flagship end-to-end training-data cleaning pipeline as ONE
  * declarative plan — the workload the whole engine exists for:
  *
  *   1. score every document (composite quality heuristic);
  *   2. drop low-quality docs (q < 0.5);
  *   3. near-dup-dedup at text level: keep the best doc per 16-bit
  *      SimHash bucket;
  *   4. join the survivors to their embeddings (broadcast-friendly);
  *   5. near-dup-dedup at embedding level: within an LSH shard, drop the
  *      higher-id side of any pair with cosine sim > 0.4;
  *   6. profile the surviving corpus per language.
  *
  * Every stage is a Catalyst-visible transform (filters push down,
  * joins broadcast, the self-join is shard-bucketed) and the whole
  * thing is mirrored as one DuckDB CTE chain — stage-for-stage.
  */
object PipelineQueries {
  private val lsh = Lsh.default

  val qPipeline = Q(
    "q_pipeline",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          round(T.qualityScore(col("text")), 6).as("q"),
          T.hashes31(array_distinct(T.tokens(col("text")))).as("hs"))
        .select(col("doc_id"), col("lang"), col("q"),
          T.simhashFromHashes(col("hs"), 16).as("simhash"))
        .where(col("q") >= 0.5)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("simhash").orderBy(col("q").desc, col("doc_id"))
      val kept = docs.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select("doc_id", "lang", "q")

      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), V.asDouble(col("embedding")).as("vec"),
          lsh.shardCol(col("embedding")).as("shard"),
          V.l2Norm(col("embedding")).as("nrm"))
      // checkpoint: `joined` feeds the near-dup self-join AND the final
      // anti-join — truncate the lineage so scoring/SimHash/window run once
      val joined = kept.join(emb, kept("doc_id") === emb("vec_id"))
        .select(col("doc_id"), col("lang"), col("q"),
          col("vec"), col("shard"), col("nrm"))
        .transform(graft.operators.Materialize.cut(_))

      // stage 5 through the salted bucket join (EmbeddingDedup): blocks=4
      // spreads a hot LSH bucket's quadratic pairing across 10 block-pair
      // shuffle keys; the pair set — and so the oracle rows — is unchanged
      val dupIds = graft.operators.EmbeddingDedup
        .bucketPairs(
          joined.select(col("shard"), col("doc_id").as("id"), col("vec"), col("nrm")),
          minSim = 0.4, blocks = 4)
        .select(col("b_id").as("doc_id")).distinct()

      joined.join(dupIds, Seq("doc_id"), "left_anti")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          // q is pre-rounded to 6dp, so a plain double avg can land
          // exactly on a rounding boundary and flip vs the oracle:
          // sum exactly in decimal, divide once in double
          round(sum(col("q").cast("decimal(18,6)")).cast("double") / count(lit(1)), 6).as("avg_q"),
          round(avg("nrm"), 6).as("avg_norm"))
        .orderBy("lang")
    },
    Some {
      val qE = T.sqlQualityScore("text")
      val shE = T.sqlSimhash(s"list_distinct(${T.sqlTokens("text")})", 16)
      val shardE = lsh.sqlShardExpr("embedding")
      s"""WITH scored AS (
            SELECT doc_id, lang, round($qE, 6) AS q, $shE AS simhash
            FROM documents),
          qualified AS (SELECT * FROM scored WHERE q >= 0.5),
          kept AS (
            SELECT doc_id, lang, q FROM (
              SELECT doc_id, lang, q,
                     row_number() OVER (PARTITION BY simhash ORDER BY q DESC, doc_id) AS rn
              FROM qualified) WHERE rn = 1),
          joined AS (
            SELECT k.doc_id, k.lang, k.q, e.embedding,
                   $shardE AS shard,
                   sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) AS nrm
            FROM kept k JOIN embeddings e ON k.doc_id = e.vec_id),
          dups AS (
            SELECT DISTINCT b.doc_id
            FROM joined a JOIN joined b ON a.shard = b.shard AND a.doc_id < b.doc_id
            WHERE round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
                        NULLIF(a.nrm * b.nrm, 0), 6) > 0.4),
          survivors AS (
            SELECT * FROM joined WHERE doc_id NOT IN (SELECT doc_id FROM dups))
          SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                 round(CAST(sum(CAST(q AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_q,
                 round(avg(nrm), 6) AS avg_norm
          FROM survivors GROUP BY lang ORDER BY lang"""
    })

  def all: Seq[Q] = Seq(qPipeline)
}
