package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multi-format readers that normalize embedding dumps to the canonical
  * `(vec_id BIGINT, embedding ARRAY<FLOAT>, label INT)` frame the rest
  * of the engine consumes. The reference reads Parquet only
  * (/root/reference/vector_lake/core/index.py:240-256); Spark's source
  * API gives CSV/JSONL (and anything else with a DataSource) for free —
  * all three produce identical downstream plans.
  */
object EmbeddingSources {

  val schema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private def normalize(df: DataFrame): DataFrame =
    df.select(col("vec_id").cast(LongType),
      col("embedding").cast(ArrayType(FloatType)),
      col("label").cast(IntegerType))

  /** Shared validation: the canonical columns must be present; the
    * error names what's MISSING, not what happens to be there. */
  private def validated(df: DataFrame, path: String): DataFrame = {
    val missing = Set("vec_id", "embedding", "label") -- df.columns.toSet
    require(missing.isEmpty, s"missing columns in $path: ${missing.mkString(",")}")
    normalize(df)
  }

  /** Parquet with schema validation (canonical format). */
  def parquet(spark: SparkSession, path: String): DataFrame =
    validated(spark.read.parquet(path), path)

  /** CSV with the vector as a `|`-delimited string column, e.g.
    * `7,0.1|0.2|0.3,4` — the common exported-from-numpy shape. */
  def csv(spark: SparkSession, path: String): DataFrame =
    normalize(spark.read
      .schema("vec_id LONG, embedding STRING, label INT")
      .csv(path)
      .withColumn("embedding",
        split(col("embedding"), "\\|").cast(ArrayType(FloatType))))

  /** JSON-lines with a native array field:
    * `{"vec_id":7,"embedding":[0.1,0.2],"label":4}`. */
  def jsonl(spark: SparkSession, path: String): DataFrame =
    normalize(spark.read
      .schema("vec_id LONG, embedding ARRAY<FLOAT>, label INT")
      .json(path))

  /** ORC — Spark's other native columnar format, same validation
    * contract as [[parquet]]; useful when an upstream Hive/Trino
    * pipeline hands embeddings over as ORC instead. */
  def orc(spark: SparkSession, path: String): DataFrame =
    validated(spark.read.orc(path), path)
}
