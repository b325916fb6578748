package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.TopKAggregate
import graft.functions.{VectorFunctions => V}

class TopKAggregateSpec extends SparkSpec {
  import spark.implicits._

  test("heap top-k golden: smallest k by (dist, id), sorted") {
    val df = Seq(
      ("g", 5.0, 1L), ("g", 1.0, 2L), ("g", 3.0, 3L),
      ("g", 1.0, 1L), ("g", 0.5, 9L))
      .toDF("grp", "dist", "id")
    val out = df.groupBy("grp")
      .agg(TopKAggregate.topK(struct(col("dist"), col("id")), 3).as("top"))
      .select(explode(col("top")).as("p"))
      .select(col("p.dist"), col("p.id"))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(out === Seq((0.5, 9L), (1.0, 1L), (1.0, 2L))) // tie on 1.0 -> lower id first
  }

  test("agrees with the window row_number formulation on real batch kNN") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), V.asDouble(col("embedding")).as("vec"),
        V.l2Norm(col("embedding")).as("nrm"))
    val q = e.orderBy("vec_id").limit(5)
      .select(col("vec_id").as("qid"), col("vec").as("qvec"), col("nrm").as("qnrm"))
    val cand = e.crossJoin(broadcast(q))
      .select(col("qid"), col("vec_id"),
        round(lit(1.0) - V.dot(col("vec"), col("qvec")) / (col("nrm") * col("qnrm")), 6).as("dist"))

    val viaWindow = cand
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("dist"), col("vec_id"))))
      .where(col("rank") <= 3)
      .select("qid", "vec_id", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val viaHeap = cand.groupBy("qid")
      .agg(TopKAggregate.topK(struct(col("dist"), col("vec_id")), 3).as("top"))
      .select(col("qid"), explode(col("top")).as("p"))
      .select(col("qid"), col("p.id").as("vec_id"), col("p.dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(viaHeap === viaWindow)
  }

  test("string ids: Lake.topKBatch returns per-query ranked uuid hits") {
    val lake = Lake(spark, LakeConfig(
      s"${java.nio.file.Files.createTempDirectory("graft_topk")}/lake", dim = 3, numHashes = 3))
    lake.ingest(Seq(
      (Seq(1.0f, 0f, 0f), "d1"), (Seq(0f, 1.0f, 0f), "d2"),
      (Seq(0.9f, 0.1f, 0f), "d3")).toDF("vector", "document"))
    val out = lake.topKBatch(Seq((100L, Seq(1.0, 0.0, 0.0)), (200L, Seq(0.0, 1.0, 0.0))), 2)
      .collect()
    assert(out.length === 4)
    val byQid = out.groupBy(_.getLong(0))
    assert(byQid(100L).map(_.getInt(1)).toSeq === Seq(1, 2)) // ranks
    assert(byQid(100L).head.getAs[String]("id").length === 36) // uuid ids
    // ranked ascending by distance per query
    byQid.values.foreach { rows =>
      val d = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(d.sameElements(d.sorted))
    }
  }

  test("partial aggregation appears in the plan (map-side combine)") {
    val df = Seq(("a", 1.0, 1L)).toDF("g", "dist", "id")
      .groupBy("g").agg(TopKAggregate.topK(struct(col("dist"), col("id")), 2).as("t"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_top_k_by_dist") || plan.contains("ObjectHashAggregate"), plan.take(800))
  }
}
