package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => V}

/** IVF (inverted-file) approximate nearest neighbor — the
  * *learned-centroid* scale path for similarity search, complementing the
  * data-independent LSH router:
  *
  *  1. `train`: deterministic k-means over the corpus (init = first k
  *     vectors in id order, fixed iteration count) — all assignment work
  *     is distributed DataFrame ops; only the k×dim centroid matrix ever
  *     reaches the driver (tiny, broadcast back as literals).
  *  2. `assign`: cell id = argmin centroid L2 — a pure expression, so at
  *     ingest time the cell becomes a partition column exactly like the
  *     LSH shard (directory pruning at query time).
  *  3. `search`: rank cells by centroid distance to the query
  *     (driver-side, k ops), scan only the top `nprobe` cells, exact
  *     top-k inside — recall/cost dial identical in spirit to
  *     `Lake.topKMultiProbe`.
  *
  * At 100 TB: train on a sample, assign map-side on ingest, and a query
  * touches nprobe/k of the data. The k-means ITERATION is not portably
  * bit-stable across engines, but the consumed surface is:
  * [[graft.queries.AnnQueries]] oracle-pairs assignment + nprobe scan by
  * inlining the rounded final centroids as SQL literals; recall and
  * invariant coverage lives in IvfSpec.
  */
object Ivf {

  final case class IvfModel(centroids: IndexedSeq[IndexedSeq[Double]]) {
    def k: Int = centroids.length

    /** Cell assignment as an expression: argmin over k squared-L2
      * distances to literal centroids (array-of-structs min trick —
      * lexicographic min on (dist, idx) is deterministic on ties). */
    def assignCol(vec: Column): Column = {
      val pairs = centroids.zipWithIndex.map { case (c, i) =>
        struct(
          V.l2Dist(vec, V.vecLit(c)).as("d"),
          lit(i).as("i"))
      }
      array_min(array(pairs: _*)).getField("i")
    }

    /** Driver-side cell ranking for a query vector. */
    def cellsFor(q: Seq[Double], nprobe: Int): Seq[Int] =
      centroids.zipWithIndex.map { case (c, i) =>
        val d = c.iterator.zip(q.iterator).map { case (x, y) => (x - y) * (x - y) }.sum
        (d, i)
      }.sorted.take(nprobe).map(_._2)
  }

  /** Deterministic k-means (Lloyd's, `iters` fixed rounds, no RNG). */
  def train(df: DataFrame, vecCol: String, idCol: String, k: Int, iters: Int = 5): IvfModel = {
    val base = df.select(col(idCol).as("_id"), V.asDouble(col(vecCol)).as("_v"))
    val init = base.orderBy("_id").limit(k).collect()
    // an empty sample would otherwise surface iterations later as an
    // opaque AnalysisException (argmin over an empty centroid array)
    require(init.nonEmpty,
      "k-means training sample is empty — train on a non-empty frame")
    var model = IvfModel(init.map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq)
    (0 until iters).foreach { _ =>
      val assigned = base.withColumn("_cell", model.assignCol(col("_v")))
      val centroids = assigned
        .select(col("_cell"), posexplode(col("_v")).as(Seq("_pos", "_x")))
        .groupBy("_cell", "_pos").agg(avg("_x").as("_m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toIndexedSeq
        }
      // empty cells keep their previous centroid
      model = IvfModel(model.centroids.indices.map(i =>
        centroids.getOrElse(i, model.centroids(i))).toIndexedSeq)
    }
    model
  }

  /** Attach the cell column (partition/bucket this on write at scale). */
  def index(df: DataFrame, model: IvfModel, vecCol: String): DataFrame =
    df.withColumn("cell", model.assignCol(col(vecCol)))

  /** nprobe-cell ANN: scan only the closest cells, exact rank inside. */
  def search(indexed: DataFrame, model: IvfModel, vecCol: String, idCol: String,
      q: Seq[Double], k: Int, nprobe: Int): DataFrame = {
    val cells = model.cellsFor(q, nprobe)
    indexed
      .where(col("cell").isin(cells: _*))
      .withColumn("dist", round(V.cosineDist(col(vecCol), V.vecLit(q)), 6))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
  }
}
