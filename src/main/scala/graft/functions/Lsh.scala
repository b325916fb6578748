package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sign-bit LSH shard router — the reference's partitioner
  * (/root/reference/vector_lake/core/index.py:35-68): `numHashes` random
  * hyperplanes; shard id's bit j is 1 iff dot(plane_j, v) > 0, giving
  * 2^numHashes shards. The reference draws planes with a fixed seed
  * (index.py:45-46) so routing is deterministic across processes; we do
  * the same with a JVM-side seeded Gaussian.
  *
  * Spark-first design: the shard id is a pure *expression* over the
  * vector column (no UDF — stays in codegen), the plane matrix is a few
  * KB of literals (never shuffled, serialized into the plan), and the
  * shard column is used as a Hive-style partition column on write so a
  * literal `shard = h(q)` predicate prunes to one directory at read —
  * Catalyst partition pruning replacing the reference's
  * "load only the routed bucket" (index.py:487-489).
  *
  * At 100 TB: routing is map-side-only (no shuffle), and the partition
  * count is an explicit dial (numHashes) — 8 hashes = 256 directories,
  * each still large enough for big parquet files.
  */
final case class Lsh(dim: Int, numHashes: Int, seed: Long = 42L) {
  require(numHashes > 0 && numHashes <= 30, "numHashes in (0,30]")

  val numShards: Int = 1 << numHashes

  /** Deterministic hyperplanes: java.util.Random(seed).nextGaussian(),
    * row-major [numHashes][dim] — the engine's routing contract. */
  val planes: Array[Array[Double]] = {
    val rng = new java.util.Random(seed)
    Array.fill(numHashes, dim)(rng.nextGaussian())
  }

  /** Shard id as a codegen-friendly expression:
    * Σ_j 2^j · (dot(plane_j, v) > 0) — the fromBit = 0 case of
    * [[shardColFrom]] (ONE definition of the sign-bit weighting, so
    * the > 0.0 tie rule reshard refinement exactness rests on cannot
    * fork). */
  def shardCol(vec: Column): Column = shardColFrom(vec, 0)

  /** Contribution of hyperplanes [fromBit, numHashes) alone —
    * Σ_{j ≥ fromBit} 2^j · (dot(plane_j, v) > 0): the REFINEMENT bits
    * an incremental reshard adds to a shard id routed at a narrower
    * width. Exact by the PREFIX STABILITY of the seeded sequence: one
    * java.util.Random(seed) fills planes row-major, so
    * `Lsh(dim, h, seed).planes` is elementwise equal to
    * `Lsh(dim, h + b, seed).planes.take(h)` (LshSpec pins it) — a row's
    * width-(h+b) shard is its stored width-h shard plus this column
    * evaluated with fromBit = h. */
  def shardColFrom(vec: Column, fromBit: Int): Column = {
    require(fromBit >= 0 && fromBit <= numHashes,
      s"fromBit must be in [0, $numHashes], got $fromBit")
    if (fromBit == numHashes) lit(0)
    else planes.zipWithIndex.drop(fromBit).map { case (p, j) =>
      when(VectorFunctions.dot(vec, VectorFunctions.vecLit(p.toSeq)) > 0.0,
        lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** Shard id as a raw Catalyst expression over an already-resolved
    * input — for FunctionRegistry registration (the Column DSL builds
    * unresolved nodes that cannot round-trip through a registry
    * builder). Same arithmetic as [[shardCol]], using the fused dot
    * kernel. */
  def catalystShardExpr(input: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val cast = Cast(input, ArrayType(DoubleType))
    planes.zipWithIndex.map { case (p, j) =>
      If(GreaterThan(
          graft.expressions.DotProductExpr(cast, CreateArray(p.map(Literal(_)).toSeq)),
          Literal(0.0)),
        Literal(1 << j), Literal(0)): Expression
    }.reduceLeft((a, b) => Add(a, b))
  }

  /** Plain-Scala router (same arithmetic, for tests / driver-side literal
    * shard computation when pruning with a constant predicate). */
  def shardOf(v: Seq[Double]): Int =
    planes.zipWithIndex.map { case (p, j) =>
      val d = p.iterator.zip(v.iterator).foldLeft(0.0)((acc, xy) => acc + xy._1 * xy._2)
      if (d > 0.0) 1 << j else 0
    }.sum

  /** DuckDB oracle expression computing the same shard id from a list
    * column (planes embedded as exact double literals). */
  def sqlShardExpr(col: String): String =
    planes.zipWithIndex.map { case (p, j) =>
      s"(CASE WHEN ${VectorFunctions.sqlDotLit(col, p.toSeq)} > 0.0 THEN ${1 << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")
}

object Lsh {
  /** Default router for the 64-dim testdata embeddings: 8 hyperplanes →
    * 256 shards, mirroring the reference default `approx_shards=243 → 256`
    * (index.py:454-455). */
  val default: Lsh = Lsh(dim = 64, numHashes = 8)
}
