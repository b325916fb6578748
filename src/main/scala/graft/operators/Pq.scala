package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => V}

/** Product quantization (PQ) — the third compressed-retrieval mode next
  * to sign-bit Hamming (data-independent, 32×) and IVF (cell pruning):
  * split the vector into `m` subspaces, learn a tiny per-subspace
  * codebook (k centroids over subDim dims), and store each vector as
  * `m` small codes. At 64 dims with m=8, k=16 a vector is 8 nibbles —
  * 64 floats → 4 bytes, 64× compression — and an asymmetric-distance
  * (ADC) scan never touches the original floats: the query precomputes
  * an m×k lookup table of subspace distances, and a row's approximate
  * distance is `m` table lookups + adds, all integer-indexed.
  *
  * Everything downstream of training is a pure expression: encoding is
  * an argmin over ROUNDED literal-centroid distances (first-index on
  * ties — bit-stable cross-engine, the q_ann_ivf construction), and the
  * ADC sum is a fixed-order sum of literal doubles, so the whole scan
  * is oracle-pairable. Training reuses [[Ivf.train]] per subspace
  * (deterministic Lloyd's, no RNG) on a bounded sample — the 100 TB
  * posture: train on a sliver, encode map-side everywhere.
  */
object Pq {

  /** codebooks(mi)(c) = centroid `c` of subspace `mi` (subDim doubles). */
  final case class PqModel(codebooks: IndexedSeq[IndexedSeq[IndexedSeq[Double]]]) {
    def m: Int = codebooks.length
    def k: Int = codebooks.head.length
    def subDim: Int = codebooks.head.head.length

    /** Stable fingerprint of the codebooks on the same 6-dp grid the
      * encode expression quantizes through — two models that would
      * assign identical codes fingerprint identically, any retrain
      * that moves a centroid does not. A lake's `_meta.json` records
      * this so a writer/reader built with a different model fails
      * loudly instead of silently mixing incompatible `pq_code`s. */
    lazy val fingerprint: String = {
      val sb = new StringBuilder
      codebooks.foreach(_.foreach(_.foreach { x =>
        sb.append(java.lang.String.format(java.util.Locale.ROOT,
          "%.6f", Double.box(V.round6d(x)))).append(',')
      }))
      java.security.MessageDigest.getInstance("MD5")
        .digest(sb.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }

    /** Code for subspace `mi` as an expression: argmin of the ROUNDED
      * L2 distances to the literal codebook (first index on ties). */
    def codeCol(vec: Column, mi: Int): Column = {
      val sub = slice(vec, mi * subDim + 1, subDim)
      val ds = array(codebooks(mi).map(c =>
        round(V.l2Dist(sub, V.vecLit(c)), 6)): _*)
      (array_position(ds, array_min(ds)) - 1).cast("int")
    }

    /** Driver-side ADC lookup table for subspace `mi` of query `q`,
      * rounded to 6dp — the SAME literals are inlined into the Spark
      * expression and the oracle SQL, so parity cannot depend on how
      * either engine would compute them. */
    def lutFor(q: Seq[Double], mi: Int): IndexedSeq[Double] = {
      val sub = q.slice(mi * subDim, (mi + 1) * subDim)
      codebooks(mi).map { c =>
        V.round6d(math.sqrt(c.iterator.zip(sub.iterator)
          .map { case (x, y) => (x - y) * (x - y) }.sum))
      }
    }

    /** Approximate distance of `vec` to literal query `q`: m lookups in
      * fixed subspace order, one final round. */
    def adcDistCol(vec: Column, q: Seq[Double]): Column =
      round(codebooks.indices.map { mi =>
        element_at(V.vecLit(lutFor(q, mi)), codeCol(vec, mi) + 1)
      }.reduce(_ + _), 6)

    /** SQL twin of [[codeCol]] (1-BASED code, DuckDB list_position). */
    def sqlCodeExpr(c: String, mi: Int): String = {
      val sub = s"($c[${mi * subDim + 1}:${(mi + 1) * subDim}])"
      val ds = codebooks(mi).map(cn =>
        s"round(${V.sqlL2DistLit(sub, cn)}, 6)").mkString("[", ", ", "]")
      s"list_position($ds, list_min($ds))"
    }

    /** SQL twin of [[adcDistCol]]. */
    def sqlAdcDistExpr(c: String, q: Seq[Double]): String = {
      val terms = codebooks.indices.map { mi =>
        val lut = lutFor(q, mi).mkString("[", ", ", "]")
        s"($lut)[${sqlCodeExpr(c, mi)}]"
      }
      s"round(${terms.mkString(" + ")}, 6)"
    }
  }

  /** Train per-subspace codebooks with [[Ivf.train]] (deterministic).
    * `df` should already be the training sample at scale; `dim` is the
    * caller-known vector dimension (every call site has it — deriving
    * it would cost a Spark job and fail opaquely on an empty sample). */
  def train(df: DataFrame, vecCol: String, idCol: String, dim: Int,
      m: Int, k: Int, iters: Int = 3): PqModel = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val base = df.select(col(idCol).as("_id"), V.asDouble(col(vecCol)).as("_v"))
    val subDim = dim / m
    PqModel((0 until m).map { mi =>
      val sub = base.select(col("_id"),
        slice(col("_v"), mi * subDim + 1, subDim).as("_s"))
      Ivf.train(sub, "_s", "_id", k, iters).centroids
    }.toIndexedSeq)
  }

  /** Round every codebook entry to 6dp (literal-inlining hygiene —
    * [[V.round6d]], the shared parity rule). */
  def round6(model: PqModel): PqModel =
    PqModel(model.codebooks.map(_.map(_.map(V.round6d))))
}
