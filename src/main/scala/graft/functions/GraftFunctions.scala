package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.expressions.{DotProductExpr, SquaredL2Expr}

/** SQL surface for the native vector kernels: after `register(spark)`,
  * `spark.sql("SELECT vector_dot(a, b) …")` works anywhere the Scala
  * Column API does (children are cast to ARRAY<DOUBLE> automatically,
  * exact for float inputs). */
object GraftFunctions {
  private def d(e: Expression): Expression = Cast(e, ArrayType(DoubleType))

  def register(spark: SparkSession): Unit = {
    val reg = org.apache.spark.sql.GraftShims.functionRegistry(spark)
    reg.createOrReplaceTempFunction(
      "vector_dot", exprs => DotProductExpr(d(exprs(0)), d(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "vector_sq_l2", exprs => SquaredL2Expr(d(exprs(0)), d(exprs(1))), "built-in")
    // default 64-dim seed-42 router as a SQL function (the planes are
    // baked into the expression tree as literals)
    reg.createOrReplaceTempFunction(
      "lsh_shard", exprs => Lsh.default.catalystShardExpr(exprs.head), "built-in")
  }
}
