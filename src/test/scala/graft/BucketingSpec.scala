package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the pre-shuffle technique for repeated
  * big-to-big joins at scale: both sides saved with `bucketBy` on the
  * join key produce a SortMergeJoin with NO Exchange (the shuffle was
  * paid once at write time, every subsequent join is free). */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    spark.sql("DROP TABLE IF EXISTS graft_emb_b")
    spark.sql("DROP TABLE IF EXISTS graft_doc_b")
    e.write.bucketBy(8, "vec_id").sortBy("vec_id").saveAsTable("graft_emb_b")
    d.write.bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("graft_doc_b")

    val joined = spark.table("graft_emb_b")
      .join(spark.table("graft_doc_b"),
        col("vec_id") === col("doc_id"))
      .where(col("label") >= 0) // keep it a plain SMJ (no broadcast hint)
    // disable auto-broadcast so the join strategy decision is about
    // co-location, not size
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(600))
      assert(!plan.contains("Exchange"), "bucketed join must not shuffle:\n" + plan.take(1200))
      assert(joined.count() === 500L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS graft_emb_b")
      spark.sql("DROP TABLE IF EXISTS graft_doc_b")
    }
  }
}
