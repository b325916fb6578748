package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => V}

/** Johnson-Lindenstrauss random projection — the DATA-INDEPENDENT
  * dimensionality reduction next to the learned compressions (IVF
  * cells, PQ codebooks) and the 1-bit sign pack: project dim-D vectors
  * through a fixed seeded gaussian matrix to dim-d (d ≪ D) and search
  * in the projected space. No training pass at all, so it composes
  * with streaming ingest; distances are preserved in expectation with
  * O(1/√d) distortion (the JL lemma), making it the cheap first dial
  * to try before PQ.
  *
  * The matrix is generated driver-side from a seed and rounded to 6dp,
  * then inlined as literals into both the Spark expression and the
  * oracle SQL — the same parity discipline as the LSH hyperplanes
  * (`Lsh.sqlShardExpr`) and the PQ codebooks. Each output coordinate is
  * one fused dot-product kernel over the input vector: projection is a
  * pure map-side expression at any scale.
  */
object RandomProjection {

  /** outDim × inDim gaussian matrix, scaled 1/√outDim (norm-preserving
    * in expectation), entries rounded 6dp for literal inlining. */
  def matrix(inDim: Int, outDim: Int, seed: Long = 42L): IndexedSeq[IndexedSeq[Double]] = {
    val rnd = new java.util.Random(seed)
    val scale = 1.0 / math.sqrt(outDim)
    IndexedSeq.fill(outDim)(IndexedSeq.fill(inDim)(
      V.round6d(rnd.nextGaussian() * scale)))
  }

  /** Projected vector as an expression: one dot product per output
    * coordinate, fixed order. */
  def projectCol(vec: Column, m: IndexedSeq[IndexedSeq[Double]]): Column =
    array(m.map(row => V.dot(vec, V.vecLit(row))): _*)

  /** Driver-side projection of a literal query, rounded 6dp — the
    * result is inlined as the SAME literals into both engines, so its
    * own arithmetic never needs cross-engine parity. */
  def projectQuery(q: Seq[Double], m: IndexedSeq[IndexedSeq[Double]]): IndexedSeq[Double] =
    m.map(row => V.round6d(
      row.iterator.zip(q.iterator).map { case (a, b) => a * b }.sum))

  /** SQL twin of [[projectCol]] (DuckDB list_dot_product per row). */
  def sqlProjectExpr(c: String, m: IndexedSeq[IndexedSeq[Double]]): String =
    m.map(row => s"list_dot_product($c::DOUBLE[], ${row.mkString("[", ", ", "]")})")
      .mkString("[", ", ", "]")
}
