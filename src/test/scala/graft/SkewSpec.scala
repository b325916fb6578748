package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 10k rows where one key holds 90% of the data — the salted plans must
  // return exactly the unsalted answers
  private lazy val skewed = {
    val rows = (0 until 10000).map { i =>
      val k = if (i % 10 != 0) "hot" else s"cold${i % 97}"
      (k, i.toLong, i * 0.5)
    }
    rows.toDF("k", "id", "v")
  }

  test("saltedAgg(count+sum) equals the plain aggregation") {
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sv"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedAgg(
      skewed, Seq("k"), saltFrom = col("id"), salts = 8,
      partial = Map("cnt" -> (c => count(lit(1))), "sv" -> (c => sum(c))),
      finals = Map("cnt" -> (c => sum(c)), "sv" -> (c => sum(c))),
      valueCol = "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted === plain)
  }

  test("saltedAgg spreads the hot key over multiple partial groups") {
    val partials = skewed
      .withColumn("_salt", pmod(hash(col("id")), lit(8)))
      .where(col("k") === "hot")
      .select("_salt").distinct().count()
    assert(partials > 1, "hot key must occupy several salted buckets")
  }

  test("saltedJoin equals the plain join") {
    val dim = Seq(("hot", "H"), ("cold0", "C0"), ("cold5", "C5")).toDF("k", "label")
    val plain = skewed.join(dim, "k").agg(count(lit(1)), sum("v"))
      .collect().head
    val salted = Skew.saltedJoin(skewed, dim, "k", salts = 8, saltFrom = col("id"))
      .agg(count(lit(1)), sum("v")).collect().head
    assert(salted.getLong(0) === plain.getLong(0))
    assert(math.abs(salted.getDouble(1) - plain.getDouble(1)) < 1e-6)
  }
}
