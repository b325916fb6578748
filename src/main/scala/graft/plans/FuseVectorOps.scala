package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.expressions.DotProductExpr

/** Optimizer rule: rewrite the HOF dot-product pattern
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)`
  * into the fused [[DotProductExpr]] kernel — users who write the
  * idiomatic higher-order-function formulation get the no-allocation
  * codegen loop for free.
  *
  * Semantics are identical by construction (both are strict
  * left-to-right double accumulation; equivalence-tested in
  * VectorFunctionsSpec), so the rewrite is safe wherever the pattern
  * appears over ARRAY<DOUBLE> inputs. Install via [[install]]
  * (`spark.experimental.extraOptimizations`) or inject through
  * `SparkSessionExtensions.injectOptimizerRule` when building sessions.
  */
object FuseVectorOps extends Rule[LogicalPlan] {

  private def vars(args: Seq[NamedExpression], want: Seq[NamedLambdaVariable]): Boolean =
    args.length == want.length && args.zip(want).forall {
      case (a: NamedLambdaVariable, w) => a.exprId == w.exprId
      case _ => false
    }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private object HofDot {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _), zargs, _)),
            Literal(zero, DoubleType),
            LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _), margs, _),
            LambdaFunction(fin: NamedLambdaVariable, fargs, _))
          if zero == 0.0 && isDoubleArray(a) && isDoubleArray(b) &&
            vars(zargs, Seq(x, y)) && vars(margs, Seq(acc, v)) && vars(fargs, Seq(fin)) =>
        Some((a, b))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case HofDot(a, b) => DotProductExpr(a, b)
    }

  def install(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraOptimizations.contains(this))
      exp.extraOptimizations = exp.extraOptimizations :+ this
  }
}
