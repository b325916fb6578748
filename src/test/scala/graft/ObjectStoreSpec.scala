package graft

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem
import org.apache.spark.sql.functions._

/** A non-`file:` Hadoop FileSystem (scheme `bucket://`) backed by local
  * disk — stands in for an object store in this offline container, the
  * same gated posture as the reference's localstack S3 tests
  * (/root/reference/tests/conftest.py:33-42). Any Lake code path that
  * assumes `java.io.File`/local paths instead of the Hadoop FS API
  * breaks under this scheme. */
class BucketFs extends RawLocalFileSystem {
  override def getScheme: String = "bucket"
  override def getUri: URI = URI.create("bucket:///")
}

/** Exercises the S3 tier posture (SURVEY.md §2.1 S3/S4): the lake's
  * location is an opaque Hadoop FS URI, so pointing it at a non-local
  * scheme must work end-to-end with zero code changes — the same way a
  * cluster deployment swaps `file:` for `s3a:`. */
class ObjectStoreSpec extends SparkSpec {
  import spark.implicits._

  private def withBucketFs[A](body: String => A): A = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.bucket.impl", classOf[BucketFs].getName)
    val dir = java.nio.file.Files.createTempDirectory("graft_bucket").toString
    body(s"bucket://$dir")
  }

  test("lake on a non-file: FS scheme: ingest -> read -> topK -> delete round-trips") {
    withBucketFs { root =>
      val lake = Lake(spark, LakeConfig(s"$root/lake", dim = 5, numHashes = 4))
      assert(!lake.exists())
      assert(lake.count() === 0L) // empty bootstrap through the remote FS

      val v = Seq(0.1, 0.2, 0.3, 0.4, 0.5)
      lake.ingest(Seq((v.map(_.toFloat), "remote doc"))
        .toDF("vector", "document"))

      assert(lake.exists())
      assert(lake.count() === 1L)
      // every file in the plan is addressed through the bucket scheme —
      // nothing silently fell back to a local file: path
      val files = lake.read().inputFiles
      assert(files.nonEmpty && files.forall(_.startsWith("bucket:")), files.mkString(","))

      val hit = lake.topKExact(v, 1).collect().head
      assert(hit.getAs[String]("document") === "remote doc")
      assert(hit.getAs[Double]("dist") === 0.0)

      lake.delete()
      assert(!lake.exists())
    }
  }

  test("sidecar metadata lands on the remote FS too") {
    withBucketFs { root =>
      val lake = Lake(spark, LakeConfig(s"$root/lake2", dim = 3, numHashes = 3))
      lake.ingest(Seq((Seq(1f, 0f, 0f), "d")).toDF("vector", "document"))
      val p = new org.apache.hadoop.fs.Path(s"$root/lake2/_meta.json")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.exists(p))
    }
  }
}
