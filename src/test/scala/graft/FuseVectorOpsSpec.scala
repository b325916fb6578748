package graft

import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}
import graft.plans.FuseVectorOps

class FuseVectorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("HOF dot-product pattern is rewritten to the fused kernel") {
    FuseVectorOps.install(spark)
    // non-literal input: literals would be constant-folded before the plan
    // is inspectable
    val df = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(V.dotHof(V.asDouble(col("embedding")), V.vecLit(Fixtures.queryVec)).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("vector_dot"), optimized.take(600))
    assert(!optimized.contains("aggregate("), optimized.take(600))
  }

  test("rewrite does not fire on float arrays or different reducers") {
    FuseVectorOps.install(spark)
    // different merge op (max instead of +) must stay a HOF aggregate
    val noFuse = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => greatest(acc, x)).as("m"))
    val plan = noFuse.queryExecution.optimizedPlan.toString
    assert(!plan.contains("vector_dot"), plan)
    assert(noFuse.head().getDouble(0) === 8.0)
  }

  test("fused and unfused results agree on testdata embeddings") {
    FuseVectorOps.install(spark)
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(50)
    val rows = e.select(
      V.dotHof(V.asDouble(col("embedding")), V.vecLit(Fixtures.queryVec)).as("hof"),
      V.dot(col("embedding"), V.vecLit(Fixtures.queryVec)).as("native"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }
}
