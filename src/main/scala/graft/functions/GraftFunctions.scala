package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.expressions.{DotProductExpr, Hashes31Expr, ShingleHash31Expr,
  SimhashExpr, SquaredL2Expr}

/** SQL surface for the native kernels: after `register(spark)`,
  * `spark.sql("SELECT vector_dot(a, b) …")` works anywhere the Scala
  * Column API does (children are cast to ARRAY<DOUBLE> automatically,
  * exact for float inputs). */
object GraftFunctions {
  private def d(e: Expression): Expression = Cast(e, ArrayType(DoubleType))
  private def litInt(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  /** Name → expression builder for every SQL-exposed kernel; one list
    * shared by per-session [[register]] and the cluster-wide
    * [[graft.plans.GraftExtensions]] injection. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vector_dot" -> (exprs => DotProductExpr(d(exprs(0)), d(exprs(1)))),
    "vector_sq_l2" -> (exprs => SquaredL2Expr(d(exprs(0)), d(exprs(1)))),
    "sign_pack" -> (exprs => graft.expressions.SignPackExpr(d(exprs(0)))),
    // the shard router as a SQL function (planes baked into the
    // expression tree as literals). One arg: the default 64-dim seed-42
    // router. Four args — lsh_shard(vec, dim, numHashes, seed), all but
    // the vector int literals — routes for ANY lake config, and over a
    // LITERAL query vector the whole expression CONSTANT-FOLDS to the
    // shard id, so `WHERE shard = lsh_shard(array(...), d, h, s)` on a
    // `USING graft` table prunes to one directory: routed kNN in pure
    // SQL, no Scala API (GraftFormatSpec pins the pruned plan).
    "lsh_shard" -> (exprs =>
      if (exprs.size == 1) Lsh.default.catalystShardExpr(exprs.head)
      else {
        require(exprs.size == 4,
          "lsh_shard takes (vector) or (vector, dim, numHashes, seed)")
        Lsh(litInt(exprs(1), "dim"), litInt(exprs(2), "numHashes"),
          litInt(exprs(3), "seed").toLong)
          .catalystShardExpr(exprs(0))
      }),
    // text-hash kernels (round 2): the SQL names of the dedup family
    "hashes31" -> (exprs => Hashes31Expr(exprs.head)),
    "shingle_hash31" ->
      (exprs => ShingleHash31Expr(exprs(0), litInt(exprs(1), "shingle width n"))),
    "simhash64" ->
      (exprs => SimhashExpr(exprs(0), litInt(exprs(1), "simhash bits"))),
    "doc_fingerprint" -> (exprs => graft.expressions.FingerprintExpr(exprs.head)),
    "quantize_audit" -> (exprs => graft.expressions.QuantizeAuditExpr(d(exprs.head))),
    // bloom semi-join surface (round 5): Spark ships the expressions
    // but exposes no SQL names for them — with these, the BloomJoin
    // pruning pattern is writable in plain SQL:
    //   WHERE bloom_might_contain((SELECT bloom_agg(k, n, bits) FROM
    //   build), probe_k)  (uncorrelated scalar subqueries are the one
    //   non-constant bloom argument BloomFilterMightContain accepts)
    "bloom_agg" -> (exprs =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(exprs(0))),
        exprs(1), exprs(2))),
    "bloom_might_contain" -> (exprs =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        exprs(0),
        new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(exprs(1))))),
    // Misra-Gries frequent items (round 11): heavy_hitters(key, capacity)
    // — the map-side-combinable sketch as a SQL aggregate; emits
    // ARRAY<STRUCT<key, cnt, err>> sorted (cnt DESC, key ASC), exact
    // (err = 0) whenever the data's distinct keys fit the capacity
    "heavy_hitters" -> (exprs =>
      graft.expressions.HeavyHittersAggregate(
        exprs(0), litInt(exprs(1), "capacity"))))

  def register(spark: SparkSession): Unit = {
    val reg = org.apache.spark.sql.GraftShims.functionRegistry(spark)
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }
}
