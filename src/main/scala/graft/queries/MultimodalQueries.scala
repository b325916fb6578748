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

/** ANN with learned centroids (graft.operators.Ivf). Rows-only check:
  * k-means centroids are float-iterative, not portable to a SQL oracle;
  * exactness/recall invariants live in IvfSpec. */
object AnnQueries {
  import graft.operators.Ivf

  val qAnnIvf = Q(
    "q_ann_ivf",
    (s, dir) => {
      val emb = graft.Tables.embeddings(s, dir)
      val model = Ivf.train(emb, "embedding", "vec_id", k = 8, iters = 3)
      Ivf.search(Ivf.index(emb, model, "embedding"), model,
        "embedding", "vec_id", graft.Fixtures.queryVec, 10, nprobe = 2)
        .select(col("vec_id"), col("cell"), col("dist"))
    },
    None)

  def all: Seq[Q] = Seq(qAnnIvf)
}
