package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal

/** Oracle-checked multimodal pipeline: documents → asset payloads →
  * (stub) decode features → resize → frame-sample → per-kind profile.
  * The expression twin of the partition-wise decoder runs here so DuckDB
  * can verify the arithmetic; the mapPartitions path is equivalence-
  * tested in MultimodalSpec. */
object MultimodalQueries {

  val qAssetFeatures = Q(
    "q_asset_features",
    (s, dir) => {
      val kind = element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int"))
      val feats = Tables.documents(s, dir)
        .select(Seq(col("doc_id").as("asset_id"), kind.as("kind")) ++
          Multimodal.featureCols(col("text"), kind): _*)
      val resized = feats.select(
        Seq(col("asset_id"), col("kind"), col("byte_len"), col("duration_ms")) ++
          Multimodal.resizeCols(col("width"), col("height"), 224): _*)
        .withColumn("n_frames",
          size(Multimodal.frameSampleCol(col("duration_ms"), 32)).cast("long"))
      resized.groupBy("kind")
        .agg(count(lit(1)).as("n"),
          sum("byte_len").as("total_bytes"),
          sum("out_w").as("sum_w"), sum("out_h").as("sum_h"),
          sum("n_frames").as("total_frames"))
        .orderBy("kind")
    },
    Some {
      val kindE = "(['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INTEGER)]"
      val featE = Multimodal.sqlFeatureCols("text", kindE).mkString(", ")
      val resizeE = Multimodal.sqlResizeCols("width", "height", 224).mkString(", ")
      val framesE = Multimodal.sqlFrameSampleLen("duration_ms", 32)
      s"""WITH f AS (SELECT doc_id AS asset_id, $kindE AS kind, $featE FROM documents),
          r AS (SELECT asset_id, kind, byte_len, duration_ms, $resizeE,
                       CAST($framesE AS BIGINT) AS n_frames FROM f)
          SELECT kind, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(byte_len) AS BIGINT) AS total_bytes,
                 CAST(sum(out_w) AS BIGINT) AS sum_w,
                 CAST(sum(out_h) AS BIGINT) AS sum_h,
                 CAST(sum(n_frames) AS BIGINT) AS total_frames
          FROM r GROUP BY kind ORDER BY kind"""
    })

  /** Same per-kind profile computed through the PARTITION-WISE decoder
    * (Dataset mapPartitions + FakeDecoder) instead of the expression
    * twin — the oracle is the same md5 arithmetic, so this proves the
    * typed executor path (the one a real ffmpeg/imageio decoder would
    * take) agrees with SQL cross-engine, not just the Column twin. */
  val qAssetDecode = Q(
    "q_asset_decode",
    (s, dir) => {
      val feats = Multimodal.decodeAll(
        Multimodal.assetsFromDocuments(s, Tables.documents(s, dir)))
      feats.groupBy("kind")
        .agg(count(lit(1)).as("n"),
          sum("byte_len").as("total_bytes"),
          sum("width").as("sum_w"), sum("height").as("sum_h"),
          sum("duration_ms").as("sum_duration_ms"))
        .orderBy("kind")
    },
    Some {
      val kindE = "(['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INTEGER)]"
      val featE = Multimodal.sqlFeatureCols("text", kindE).mkString(", ")
      s"""WITH f AS (SELECT doc_id AS asset_id, $kindE AS kind, $featE FROM documents)
          SELECT kind, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(byte_len) AS BIGINT) AS total_bytes,
                 CAST(sum(width) AS BIGINT) AS sum_w,
                 CAST(sum(height) AS BIGINT) AS sum_h,
                 CAST(sum(duration_ms) AS BIGINT) AS sum_duration_ms
          FROM f GROUP BY kind ORDER BY kind"""
    })

  def all: Seq[Q] = Seq(qAssetFeatures, qAssetDecode)
}

/** ANN with learned centroids (graft.operators.Ivf) — fully
  * oracle-paired. k-means ITERATION is float-accumulative and not
  * bit-portable across engines, but the part users consume — cell
  * assignment + nprobe scan + top-k — is: train in Scala, ROUND the
  * final centroids to 6dp, run the Spark query with the rounded
  * literals, and inline the same literals into the oracle SQL (the
  * `Lsh.sqlShardExpr` hyperplane trick). Assignment distances are
  * rounded to 6dp on BOTH engines before the argmin (first-index on
  * ties), so the argmin compares identical bits — no ulp-level
  * cross-engine flips. */
object AnnQueries {
  import graft.operators.Ivf
  import graft.functions.{VectorFunctions => V}

  private val K = 8
  private val NProbe = 2

  /** Centroids per (session, sfDir) qAnnIvf run. `Registry.oracleSql`
    * is a def evaluated AFTER every query has run (Verify dumps
    * oracle_sql.json last), so the oracle replays exactly the literals
    * the Spark side used. Before any run there is no entry → rows-only
    * fallback.
    *
    * Keyed by (session identity, sfDir) rather than a last-run
    * singleton: one JVM running multiple scale factors or concurrent
    * sessions can no longer pair the oracle with the WRONG run's
    * centroids — when the store holds more than one distinct model the
    * oracle abstains (rows-only) instead of guessing. The driver's
    * Verify flow (one sfDir per JVM) always sees exactly one model. */
  private val models =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), Ivf.IvfModel]()

  /** The oracle-abstain rule shared by every learned-model store:
    * exactly one DISTINCT model (value equality — two sessions training
    * on the same sfDir converge to the same model) → use it; zero or
    * several → no oracle rather than a possibly-wrong pairing. */
  private def soleModel[T](
      store: java.util.concurrent.ConcurrentHashMap[(Int, String), T]): Option[T] = {
    import scala.jdk.CollectionConverters._
    val distinct = store.values.asScala.toSeq.distinct
    if (distinct.length == 1) Some(distinct.head) else None
  }

  private def round6(m: Ivf.IvfModel): Ivf.IvfModel =
    Ivf.IvfModel(m.centroids.map(_.map(V.round6d)))

  /** The one model-fetch idiom shared by qAnnIvf/qSemDedup/
    * qClusterLabels: train-once-per-(session, sfDir), rounded. */
  private def cachedModel(s: org.apache.spark.sql.SparkSession, dir: String,
      emb: org.apache.spark.sql.DataFrame): Ivf.IvfModel =
    models.computeIfAbsent((System.identityHashCode(s), dir),
      _ => round6(Ivf.train(emb, "embedding", "vec_id", k = K, iters = 3)))

  /** Cell = first index of the minimum ROUNDED L2 distance — the same
    * array_position/list_position construction on both engines. */
  private def assignRounded(vec: org.apache.spark.sql.Column, m: Ivf.IvfModel) = {
    val ds = array(m.centroids.map(c => round(V.l2Dist(vec, V.vecLit(c)), 6)): _*)
    (array_position(ds, array_min(ds)) - 1).cast("int")
  }

  private def sqlAssignRounded(c: String, m: Ivf.IvfModel): String = {
    val ds = m.centroids.map(cn => s"round(${V.sqlL2DistLit(c, cn)}, 6)")
      .mkString("[", ", ", "]")
    s"CAST(list_position($ds, list_min($ds)) - 1 AS INTEGER)"
  }

  def qAnnIvf = Q(
    "q_ann_ivf",
    (s, dir) => {
      val emb = graft.Tables.embeddings(s, dir)
      // training is the offline step of IVF — computeIfAbsent caches the
      // model per (session, sfDir) so repeated query runs (bench reps)
      // time the SERVE path; determinism makes the cache exact (same
      // data + fixed init/iters ⇒ bit-identical model on a retrain)
      val m = cachedModel(s, dir, emb)
      val cells = m.cellsFor(graft.Fixtures.queryVec, NProbe)
      emb
        .withColumn("cell", assignRounded(col("embedding"), m))
        .where(col("cell").isin(cells: _*))
        .select(col("vec_id"), col("cell"),
          V.round6z(V.cosineDist(col("embedding"),
            V.vecLit(graft.Fixtures.queryVec))).as("dist"))
        .orderBy(col("dist"), col("vec_id"))
        .limit(10)
    },
    soleModel(models).map { m =>
      val cells = m.cellsFor(graft.Fixtures.queryVec, NProbe)
      s"""WITH c AS (SELECT vec_id, embedding,
                            ${sqlAssignRounded("embedding", m)} AS cell
                     FROM embeddings)
          SELECT vec_id, cell,
                 ${V.sqlRound6z(V.sqlCosineDistLit("embedding", graft.Fixtures.queryVec))} AS dist
          FROM c WHERE cell IN (${cells.mkString(", ")})
          ORDER BY dist, vec_id LIMIT 10"""
    })

  /** PQ model store, same (session, sfDir) keying + ambiguity-abstain
    * discipline as `models` above. */
  private val pqModels =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), graft.operators.Pq.PqModel]()

  /** The PQ twin of [[cachedModel]]: train 8×16 codebooks once per
    * (session, sfDir) on a bounded sample (`vec_id < 1000` — the
    * train-on-a-sliver posture), rounded to the 6-dp literal grid. */
  private def cachedPqModel(s: org.apache.spark.sql.SparkSession, dir: String,
      emb: org.apache.spark.sql.DataFrame): graft.operators.Pq.PqModel =
    pqModels.computeIfAbsent((System.identityHashCode(s), dir),
      _ => graft.operators.Pq.round6(graft.operators.Pq.train(
        emb.where(col("vec_id") < 1000), "embedding", "vec_id",
        dim = graft.Fixtures.queryVec.length, m = 8, k = 16, iters = 2)))

  /** Product-quantization ADC scan ([[graft.operators.Pq]]): train
    * 8×16 codebooks on a bounded sample (the at-scale posture), encode
    * every vector to 8 codes via rounded-argmin expressions, and rank
    * by the asymmetric distance — 8 literal-table lookups per row, no
    * float vector touched after encoding. Fully oracle-paired through
    * the same rounded-literal trick as q_ann_ivf. */
  def qKnnPq = Q(
    "q_knn_pq",
    (s, dir) => {
      val emb = graft.Tables.embeddings(s, dir)
      // same offline-training cache discipline as qAnnIvf above
      val m = cachedPqModel(s, dir, emb)
      emb
        .select(col("vec_id"),
          m.adcDistCol(col("embedding"), graft.Fixtures.queryVec).as("pq_dist"))
        .orderBy(col("pq_dist"), col("vec_id"))
        .limit(10)
    },
    soleModel(pqModels).map { m =>
      s"""SELECT vec_id,
                 ${m.sqlAdcDistExpr("embedding", graft.Fixtures.queryVec)} AS pq_dist
          FROM embeddings
          ORDER BY pq_dist, vec_id LIMIT 10"""
    })

  /** Recall@50 audit of the PQ scan against the exact L2 ranking — the
    * eval metric a retrieval deployment actually monitors, expressed as
    * a query: |PQ-top-50 ∩ exact-top-50|. Both sides are deterministic
    * (literal LUTs / literal query vector, full tiebreaks), so the
    * overlap count is oracle-exact, not a statistical bound. */
  def qPqRecall = Q(
    "q_pq_recall",
    (s, dir) => {
      val emb = graft.Tables.embeddings(s, dir)
      val m = cachedPqModel(s, dir, emb)
      val pq = emb.select(col("vec_id"),
          m.adcDistCol(col("embedding"), graft.Fixtures.queryVec).as("d"))
        .orderBy(col("d"), col("vec_id")).limit(50).select("vec_id")
      val exact = emb.select(col("vec_id"),
          round(V.l2Dist(col("embedding"),
            V.vecLit(graft.Fixtures.queryVec)), 6).as("d"))
        .orderBy(col("d"), col("vec_id")).limit(50).select("vec_id")
      pq.join(exact, Seq("vec_id"), "left_semi")
        .agg(count(lit(1)).as("n_overlap"))
    },
    soleModel(pqModels).map { m =>
      s"""WITH pq AS (SELECT vec_id FROM embeddings
                      ORDER BY ${m.sqlAdcDistExpr("embedding", graft.Fixtures.queryVec)}, vec_id
                      LIMIT 50),
               ex AS (SELECT vec_id FROM embeddings
                      ORDER BY round(${V.sqlL2DistLit("embedding", graft.Fixtures.queryVec)}, 6), vec_id
                      LIMIT 50)
          SELECT CAST(count(*) AS BIGINT) AS n_overlap
          FROM pq SEMI JOIN ex USING (vec_id)"""
    })

  /** IVF × PQ — the composed big-ANN serving pipeline (the
    * IVFADC architecture of Jégou et al. 2011, and what FAISS/Milvus
    * run at billion scale), each stage cutting what the next reads:
    * (1) PROBE: k-means cells rank by centroid distance to the query
    * and only the top `NProbe` are scanned — the candidate universe
    * shrinks by nprobe/k before any vector work; (2) COARSE: rows
    * inside probed cells rank by PQ asymmetric distance — m table
    * lookups per row, no float vector math; (3) RERANK: exact cosine
    * over the ≤ 30 survivors. Both models are deterministic and
    * literal-inlined, so the full three-stage pipeline is
    * oracle-paired — not just its parts (q_ann_ivf, q_knn_pq).
    * The lake-API twin over MATERIALIZED codes and shard dirs is
    * [[graft.Lake.topKPqRouted]] (PqSpec). */
  def qIvfPq = Q(
    "q_ivf_pq",
    (s, dir) => {
      val emb = graft.Tables.embeddings(s, dir)
      val mi = cachedModel(s, dir, emb)
      val mp = cachedPqModel(s, dir, emb)
      val cells = mi.cellsFor(graft.Fixtures.queryVec, NProbe)
      val coarse = emb
        .withColumn("cell", assignRounded(col("embedding"), mi))
        .where(col("cell").isin(cells: _*))
        .select(col("vec_id"),
          mp.adcDistCol(col("embedding"), graft.Fixtures.queryVec).as("pq_dist"))
        .orderBy(col("pq_dist"), col("vec_id"))
        .limit(30)
        .select("vec_id")
      emb.join(coarse, Seq("vec_id"))
        .select(col("vec_id"),
          V.round6z(V.cosineDist(col("embedding"),
            V.vecLit(graft.Fixtures.queryVec))).as("dist"))
        .orderBy(col("dist"), col("vec_id"))
        .limit(10)
    },
    for (mi <- soleModel(models); mp <- soleModel(pqModels)) yield {
      val cells = mi.cellsFor(graft.Fixtures.queryVec, NProbe)
      s"""WITH c AS (SELECT vec_id, embedding,
                            ${sqlAssignRounded("embedding", mi)} AS cell
                     FROM embeddings),
               coarse AS (SELECT vec_id FROM c
                          WHERE cell IN (${cells.mkString(", ")})
                          ORDER BY ${mp.sqlAdcDistExpr("embedding", graft.Fixtures.queryVec)}, vec_id
                          LIMIT 30)
          SELECT e.vec_id,
                 ${V.sqlRound6z(V.sqlCosineDistLit("e.embedding", graft.Fixtures.queryVec))} AS dist
          FROM embeddings e JOIN coarse USING (vec_id)
          ORDER BY dist, vec_id LIMIT 10"""
    })

  /** kNN in a Johnson-Lindenstrauss projected space
    * ([[graft.operators.RandomProjection]]): 64 dims → 16 through a
    * fixed seeded matrix (literals on both engines — no training, no
    * model store), L2 ranking over the projected vectors. The
    * data-independent counterpart of q_knn_pq: same compression goal,
    * zero offline state, composable with streaming ingest. */
  def qKnnJl = Q(
    "q_knn_jl",
    (s, dir) => {
      import graft.operators.RandomProjection
      val m = RandomProjection.matrix(graft.Fixtures.queryVec.length, 16)
      val qp = RandomProjection.projectQuery(graft.Fixtures.queryVec, m)
      graft.Tables.embeddings(s, dir)
        .select(col("vec_id"),
          V.round6z(V.l2Dist(
            RandomProjection.projectCol(col("embedding"), m),
            V.vecLit(qp))).as("jl_dist"))
        .orderBy(col("jl_dist"), col("vec_id"))
        .limit(10)
    },
    Some {
      import graft.operators.RandomProjection
      val m = RandomProjection.matrix(graft.Fixtures.queryVec.length, 16)
      val qp = RandomProjection.projectQuery(graft.Fixtures.queryVec, m)
      s"""SELECT vec_id,
                 ${V.sqlRound6z(s"list_distance(${RandomProjection.sqlProjectExpr("embedding", m)}, ${qp.mkString("[", ", ", "]")})")} AS jl_dist
          FROM embeddings
          ORDER BY jl_dist, vec_id LIMIT 10"""
    })

  /** SemDeDup — semantic deduplication scoped by learned clusters
    * (Abbas et al. 2023 recipe): assign every embedding to its k-means
    * cell, pair ONLY within a cell, flag pairs with cosine ≥ 0.4, and
    * report the per-cell would-drop tally (n_dup = distinct higher-id
    * members of a flagged pair). The clusters make the quadratic step
    * data-adaptive: candidates meet inside semantically dense cells
    * (where duplicates actually live), not across the corpus — same
    * complexity bound as the LSH-bucket join but with learned,
    * density-tracking buckets, and the k dial shrinks cells as the
    * corpus grows. Reuses q_ann_ivf's cached deterministic model, so
    * the oracle replays the identical rounded-centroid literals; the
    * assignment table is cut once (localCheckpoint) so the self-join
    * does not re-assign both sides. */
  def qSemDedup = Q(
    "q_semdedup",
    (s, dir) => {
      val emb = graft.Tables.embeddings(s, dir)
      val m = cachedModel(s, dir, emb)
      val e = emb
        .select(col("vec_id"), assignRounded(col("embedding"), m).as("cell"),
          V.asDouble(col("embedding")).as("vec"),
          V.l2Norm(col("embedding")).as("nrm"))
        .transform(graft.operators.Materialize.cut(_))
      val a = e.select(col("cell"), col("vec_id").as("a_id"),
        col("vec").as("a_vec"), col("nrm").as("a_nrm"))
      val b = e.select(col("cell").as("b_cell"), col("vec_id").as("b_id"),
        col("vec").as("b_vec"), col("nrm").as("b_nrm"))
      val pairs = a.join(b, col("cell") === col("b_cell") && col("a_id") < col("b_id"))
        .select(col("cell"), col("b_id"),
          V.round6z(V.cosineSimPre(V.dot(col("a_vec"), col("b_vec")),
            col("a_nrm"), col("b_nrm"))).as("sim"))
        .where(col("sim") >= 0.4)
      val cellSizes = e.groupBy("cell").agg(count(lit(1)).as("n_vecs"))
      val dupStats = pairs.groupBy("cell")
        .agg(count(lit(1)).as("n_pairs"), countDistinct("b_id").as("n_dup"),
          max("sim").as("max_sim"))
      cellSizes.join(dupStats, Seq("cell"), "left_outer")
        .select(col("cell"), col("n_vecs"),
          coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
          coalesce(col("n_dup"), lit(0L)).as("n_dup"),
          // NULL-free output: a dup-free cell reports 0.0, not NULL —
          // NULL floats round-trip as NaN through arrow/pandas and
          // NaN != NaN breaks any value comparator downstream
          coalesce(col("max_sim"), lit(0.0)).as("max_sim"))
        .orderBy("cell")
    },
    soleModel(models).map { m =>
      s"""WITH c AS (SELECT vec_id, embedding,
                            ${sqlAssignRounded("embedding", m)} AS cell
                     FROM embeddings),
               p AS (SELECT a.cell, b.vec_id AS b_id,
                            ${V.sqlRound6z(V.sqlCosineSimCols("a.embedding", "b.embedding"))} AS sim
                     FROM c a JOIN c b ON a.cell = b.cell AND a.vec_id < b.vec_id
                     WHERE ${V.sqlRound6z(V.sqlCosineSimCols("a.embedding", "b.embedding"))} >= 0.4),
               cs AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs FROM c GROUP BY cell),
               ps AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_pairs,
                             CAST(count(DISTINCT b_id) AS BIGINT) AS n_dup,
                             max(sim) AS max_sim
                      FROM p GROUP BY cell)
          SELECT cs.cell, cs.n_vecs,
                 coalesce(ps.n_pairs, 0) AS n_pairs,
                 coalesce(ps.n_dup, 0) AS n_dup,
                 coalesce(ps.max_sim, 0.0) AS max_sim
          FROM cs LEFT JOIN ps ON cs.cell = ps.cell
          ORDER BY cs.cell"""
    })

  /** Cluster labeling — the "what is IN my clusters" audit run right
    * after any embedding clustering (SemDeDup, IVF build, curation
    * mixes): assign each embedding to its k-means cell, join the
    * paired document text (vec_id = doc_id), and surface the top-3
    * tokens per cell by document frequency. The aggregate-then-window
    * shape keeps the window input at |cells|×|vocab| rows (a few
    * hundred), never the corpus; the token explode is the only
    * corpus-sized stage and it feeds a map-side-combinable hash agg.
    * Same cached deterministic model + literal-centroid oracle as
    * q_ann_ivf/q_semdedup. */
  def qClusterLabels = Q(
    "q_cluster_labels",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val emb = graft.Tables.embeddings(s, dir)
      val m = cachedModel(s, dir, emb)
      val cells = emb.select(col("vec_id"), assignRounded(col("embedding"), m).as("cell"))
      val docs = graft.Tables.documents(s, dir)
        .select(col("doc_id"),
          array_distinct(graft.functions.TextFunctions.tokens(col("text"))).as("tk"))
      val counts = cells.join(docs, cells("vec_id") === docs("doc_id"))
        .select(col("cell"), explode(col("tk")).as("token"))
        .groupBy("cell", "token").agg(count(lit(1)).as("n_docs"))
      counts
        .withColumn("rank", row_number().over(
          Window.partitionBy("cell").orderBy(col("n_docs").desc, col("token"))))
        .where(col("rank") <= 3)
        .select(col("cell"), col("rank").cast("int").as("rank"),
          col("token"), col("n_docs"))
        .orderBy("cell", "rank")
    },
    soleModel(models).map { m =>
      val tokens = graft.functions.TextFunctions.sqlTokens("text")
      s"""WITH c AS (SELECT vec_id, ${sqlAssignRounded("embedding", m)} AS cell
                     FROM embeddings),
               t AS (SELECT c.cell, unnest(list_distinct($tokens)) AS token
                     FROM c JOIN documents d ON c.vec_id = d.doc_id),
               cnt AS (SELECT cell, token, CAST(count(*) AS BIGINT) AS n_docs
                       FROM t GROUP BY cell, token),
               r AS (SELECT cell, token, n_docs,
                            CAST(row_number() OVER (PARTITION BY cell
                                 ORDER BY n_docs DESC, token) AS INTEGER) AS rank
                     FROM cnt)
          SELECT cell, rank, token, n_docs FROM r WHERE rank <= 3
          ORDER BY cell, rank"""
    })

  /** A base lake WITHOUT inline PQ plus a CO-LOCATED derived table of
    * its PQ codes ([[graft.Lake.deriveTo]]) — the RETROFIT pattern: a
    * 100 TB corpus ingested before anyone wanted PQ gains the index
    * WITHOUT a corpus rewrite (the alternative is re-ingesting every
    * row to add a `pq_code` column). Built through the incremental
    * lifecycle — half the corpus, derive, the other half, derive again
    * (change-feed refresh) — once per (session, sfDir). */
  private def derivedPqFixture(s: org.apache.spark.sql.SparkSession,
      dir: String): (graft.Lake, graft.DerivedTable, graft.operators.Pq.PqModel) =
    graft.queries.BuiltFixtures.once(s, dir, "derived_pq") {
      val emb = graft.Tables.embeddings(s, dir)
      val m = cachedPqModel(s, dir, emb)
      val tmp = graft.queries.BuiltFixtures.sessionTmp(s, dir, "pqbase")
      val base = graft.Lake(s, graft.LakeConfig(tmp, dim = 64, numHashes = 6))
      base.delete()
      val rows = emb.select(
        concat(lit("doc-"), col("vec_id")).as("id"),
        col("embedding").as("vector"),
        pmod(col("vec_id"), lit(2)).as("h"))
      def codes(df: org.apache.spark.sql.DataFrame) = df.select(
        (Seq(col("id"), col("shard")) ++
          (0 until m.m).map(mi => m.codeCol(col("vector"), mi).as(s"c$mi"))): _*)
      val dloc = graft.queries.BuiltFixtures.sessionTmp(s, dir, "pqcodes")
      base.ingest(rows.where(col("h") === 0).drop("h"))
      base.deriveTo(dloc)(codes)
      base.ingest(rows.where(col("h") =!= 0).drop("h"))
      (base, base.deriveTo(dloc)(codes), m)
    }

  /** PQ serving THROUGH the retrofit, the engine's own two-phase serve
    * idiom: (1) CANDIDATES — heap top-k (TakeOrderedAndProject) over
    * the derived table's STORED codes alone (8 literal-LUT lookups per
    * row; the corpus is never touched), the ≤30 survivors collected —
    * bounded by construction, the same driver-side step every routed
    * topK takes; (2) RERANK — the base lake read with LITERAL
    * `shard IN (...)` + `id IN (...)` predicates, so directory pruning
    * and parquet pushdown are GUARANTEED at plan time (PlanSpec pins
    * the pushed partition filter — note a broadcast join-back would
    * NOT prune: Spark's DPP benefit heuristic wants a selective filter
    * on the build side, and a top-k limit is not one). The oracle
    * recomputes codes, ADC, and the exact rerank straight from raw
    * `embeddings`, so hash-equality proves derived codes ≡ direct
    * encoding (through the incremental refresh), stored-code ADC ≡
    * vector-side ADC, and the two-phase serve lost nobody. Scale
    * shape: corpus bytes read = the ≤30 candidate shards' directories,
    * filter-pushed to 30 ids. */
  def qKnnDerivedPq = Q(
    "q_knn_derived_pq",
    (s, dir) => {
      val (base, d, m) = derivedPqFixture(s, dir)
      val q = graft.Fixtures.queryVec
      val pqDist = round((0 until m.m).map(mi =>
        element_at(graft.functions.VectorFunctions.vecLit(m.lutFor(q, mi)),
          col(s"c$mi") + 1)).reduce(_ + _), 6)
      val cand = d.read()
        .withColumn("pq_dist", pqDist)
        .orderBy(col("pq_dist"), col("id")).limit(30)
        .select(col("shard"), col("id")).collect() // ≤30 rows, bounded
      val shards = cand.map(_.getInt(0)).distinct.toSeq
      val ids = cand.map(_.getString(1)).toSeq
      s.read.format("graft").load(base.cfg.location)
        .where(col("shard").isin(shards: _*) && col("id").isin(ids: _*))
        .select(col("id"),
          graft.functions.VectorFunctions.round6z(
            graft.functions.VectorFunctions.cosineDist(col("vector"),
              graft.functions.VectorFunctions.vecLit(q))).as("dist"))
        .orderBy(col("dist"), col("id")).limit(10)
    },
    soleModel(pqModels).map { m =>
      val q = graft.Fixtures.queryVec
      s"""WITH cand AS (SELECT 'doc-' || vec_id AS id, embedding,
                               ${m.sqlAdcDistExpr("embedding", q)} AS pq_dist
                        FROM embeddings
                        ORDER BY pq_dist, id LIMIT 30)
          SELECT id,
                 ${graft.functions.VectorFunctions.sqlRound6z(
                   graft.functions.VectorFunctions.sqlCosineDistLit("embedding", q))} AS dist
          FROM cand ORDER BY dist, id LIMIT 10"""
    })

  def all: Seq[Q] = Seq(qAnnIvf, qKnnPq, qPqRecall, qIvfPq, qKnnJl, qSemDedup,
    qClusterLabels, qKnnDerivedPq)
}
