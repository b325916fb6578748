package graft

import java.nio.file.Files

import graft.sources.EmbeddingSources

class EmbeddingSourcesSpec extends SparkSpec {

  private def rows = Seq(
    (1L, Seq(0.5f, -0.25f, 0.125f), 3),
    (2L, Seq(1.0f, 0.0f, -1.0f), 7))

  test("csv, jsonl, and parquet sources normalize to identical frames") {
    val dir = Files.createTempDirectory("graft_src").toString

    Files.writeString(java.nio.file.Paths.get(s"$dir/e.csv"),
      rows.map { case (id, v, l) => s"$id,${v.mkString("|")},$l" }.mkString("\n"))
    Files.writeString(java.nio.file.Paths.get(s"$dir/e.jsonl"),
      rows.map { case (id, v, l) =>
        s"""{"vec_id":$id,"embedding":[${v.mkString(",")}],"label":$l}"""
      }.mkString("\n"))
    locally {
      import spark.implicits._
      rows.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/e.parquet")
    }

    val fromCsv = EmbeddingSources.csv(spark, s"$dir/e.csv")
    val fromJson = EmbeddingSources.jsonl(spark, s"$dir/e.jsonl")
    val fromParquet = EmbeddingSources.parquet(spark, s"$dir/e.parquet")

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getAs[scala.collection.Seq[Float]](1).toSeq, r.getInt(2))).toSeq

    locally {
      import spark.implicits._
      rows.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").orc(s"$dir/e.orc")
    }
    val fromOrc = EmbeddingSources.orc(spark, s"$dir/e.orc")

    assert(fromCsv.schema === fromJson.schema)
    assert(fromJson.schema === fromParquet.schema)
    assert(fromParquet.schema === fromOrc.schema)
    assert(canon(fromCsv) === canon(fromParquet))
    assert(canon(fromJson) === canon(fromParquet))
    assert(canon(fromOrc) === canon(fromParquet))
  }

  test("sources feed the lake ingest pipeline unchanged") {
    val dir = Files.createTempDirectory("graft_src").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/e.csv"),
      rows.map { case (id, v, l) => s"$id,${v.mkString("|")},$l" }.mkString("\n"))
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 3, numHashes = 3))
    lake.ingest(EmbeddingSources.csv(spark, s"$dir/e.csv")
      .withColumnRenamed("embedding", "vector"))
    assert(lake.count() === 2L)
  }
}
