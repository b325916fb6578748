package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The `spark.sql.extensions` deployment path: a session built with
  * GraftExtensions has the kernels as SQL functions and the fuse rule
  * installed — with zero imperative setup calls.
  *
  * Builds a NEW SparkSession over the suite-shared SparkContext
  * (getOrCreate returns the default session and skips extensions, so
  * the default is cleared first and restored after; the context itself
  * is never stopped — other suites share it). */
class GraftExtensionsSpec extends AnyFunSuite {

  test("a session built with GraftExtensions exposes kernels + fuse rule") {
    val shared = SparkSpec.session // materialize the shared context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // withExtensions: the programmatic form of
    // --conf spark.sql.extensions=graft.plans.GraftExtensions (the conf
    // form is read from the SparkContext's static conf at launch, which
    // a suite-shared context predates)
    val s = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate() // fresh session, reuses the live shared context
    try {
      val r = s.sql(
        "SELECT vector_dot(array(1.0, 2.0), array(3.0, 4.0)) AS d, " +
          "sign_pack(array(1.0, -1.0, 0.5)) AS w, " +
          "doc_fingerprint('ab') AS fp").head()
      assert(r.getDouble(0) === 11.0)
      assert(r.getLong(1) === 5L)
      assert(r.getLong(2) === 3105L)
      // fuse rule active: the HOF dot pattern over a real column (not a
      // constant-foldable literal) optimizes to the vector_dot kernel
      val plan = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .selectExpr(
          """aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>),
            |                   CAST(embedding AS ARRAY<DOUBLE>),
            |                   (x, y) -> x * y),
            |          CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS d
            |""".stripMargin)
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("vector_dot"), plan)
      // bloom surface in plain SQL: build-side sketch as an
      // uncorrelated scalar subquery, probe-side might_contain filter
      s.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .createOrReplaceTempView("ext_orders")
      val kept = s.sql(
        """SELECT count(*) FROM ext_orders
          |WHERE bloom_might_contain(
          |        (SELECT bloom_agg(o_orderkey, 100L, 8192L)
          |         FROM ext_orders WHERE o_totalprice > 450000),
          |        o_orderkey)
          |""".stripMargin).head().getLong(0)
      val truth = s.sql(
        "SELECT count(*) FROM ext_orders WHERE o_totalprice > 450000")
        .head().getLong(0)
      assert(kept >= truth, "bloom must admit every true key")
      val total = s.sql("SELECT count(*) FROM ext_orders").head().getLong(0)
      assert(kept < total, "bloom must prune on a selective build side")
    } finally {
      // hand the default back to the shared suite session; context stays up
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
