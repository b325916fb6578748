package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** The cluster deployment hook: enable the whole engine on any session
  * with
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions …
  * }}}
  *
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * Injects the [[FuseVectorOps]] optimizer rule (HOF dot-product →
  * fused-kernel rewrite) and every SQL-exposed kernel from
  * [[graft.functions.GraftFunctions.builders]] at session build — no
  * per-session `install`/`register` calls, which is how a
  * 1000-executor deployment actually turns features on. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => FuseVectorOps)
    graft.functions.GraftFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        b))
    }
  }
}
