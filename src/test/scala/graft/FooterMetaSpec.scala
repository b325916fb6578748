package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

/** The reference round-trips `last_update` (+ index attrs) through
  * parquet FILE metadata (index.py:296-305). The engine's analog: field
  * metadata on the timestamp column, which Spark's writer serializes
  * into every data file's footer key/value entry — verified here by
  * reading the raw footer with parquet-hadoop, no Spark reader
  * involved. The `_meta.json` sidecar remains the fast lookup path. */
class FooterMetaSpec extends SparkSpec {
  import spark.implicits._

  test("every data file's parquet footer carries the last_update attrs") {
    val dir = Files.createTempDirectory("graft_footer").toString
    val lake = Lake(spark, LakeConfig(s"$dir/lake", dim = 3, numHashes = 2))
    lake.ingest(Seq(
      (Seq(1f, 0f, 0f), "a"), (Seq(0f, 1f, 0f), "b"), (Seq(0f, 0f, 1f), "c"))
      .toDF("vector", "document"))

    val conf = spark.sparkContext.hadoopConfiguration
    val files = lake.read().inputFiles.map(new Path(_))
      .filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)

    files.foreach { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        val kv = reader.getFooter.getFileMetaData.getKeyValueMetaData
        val sparkSchema = kv.get("org.apache.spark.sql.parquet.row.metadata")
        assert(sparkSchema != null, s"no spark schema entry in $f")
        assert(sparkSchema.contains("graft.last_update"), s"no last_update in $f")
        assert(sparkSchema.contains("graft.dim") && sparkSchema.contains("graft.metric"))
      } finally reader.close()
    }

    // and the attrs survive a Spark read as schema field metadata
    val md = lake.read().schema("timestamp").metadata
    assert(md.contains("graft.last_update"))
    assert(md.getLong("graft.dim") === 3L)
  }
}
