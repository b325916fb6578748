package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala reference interleave for the expression to match. */
  private def ref(x: Int, y: Int, bits: Int): Long =
    (0 until bits).map { j =>
      (((x >> j) & 1).toLong << (2 * j)) | (((y >> j) & 1).toLong << (2 * j + 1))
    }.sum

  test("interleave2 matches the bit-level reference on seeded random 8-bit pairs") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(200)((rnd.nextInt(256), rnd.nextInt(256)))
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.interleave2(col("x"), col("y"), 8).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) === ref(r.getInt(0), r.getInt(1), 8),
        s"(${r.getInt(0)}, ${r.getInt(1)})")
    }
  }

  test("interleave2 is a bijection on the full 4-bit grid") {
    val df = spark.range(16).selectExpr("CAST(id AS INT) AS x")
      .crossJoin(spark.range(16).selectExpr("CAST(id AS INT) AS y"))
      .select(ZOrder.interleave2(col("x"), col("y"), 4).as("z"))
    val zs = df.collect().map(_.getLong(0))
    assert(zs.length === 256)
    assert(zs.distinct.length === 256, "z must be unique per (x,y)")
    assert(zs.min === 0L && zs.max === 255L, "4+4 bits fill [0, 255]")
  }

  test("z-locality: a unit step in either dimension moves z less than a far jump") {
    // the property that makes z-order a useful clustering key: points
    // close in BOTH dims are close in z far more often than far points
    val near = (0 until 64).map(i => math.abs(ref(i, i, 8) - ref(i + 1, i, 8)))
    val far = (0 until 64).map(i => math.abs(ref(i, i, 8) - ref(i + 64, i, 8)))
    assert(near.sum < far.sum)
  }

  test("sqlInterleave2 mirrors the column expression through Spark SQL") {
    val sql = ZOrder.sqlInterleave2("x", "y", 8)
    val df = Seq((3, 200), (255, 0), (17, 111)).toDF("x", "y")
    val both = df.select(
      ZOrder.interleave2(col("x"), col("y"), 8).as("a"),
      expr(s"CAST($sql AS BIGINT)").as("b"))
    assert(both.where(col("a") =!= col("b")).count() === 0L)
  }
}
