package graft

import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => V}
import graft.operators.Pq

class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private lazy val data = {
    val rnd = new scala.util.Random(11)
    (0L until 300L).map(i => (i, Seq.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("id", "vec")
  }
  private lazy val model = Pq.round6(Pq.train(data, "vec", "id", m = 4, k = 8, iters = 2))

  test("train is deterministic and shapes the codebooks (m × k × subDim)") {
    val again = Pq.round6(Pq.train(data, "vec", "id", m = 4, k = 8, iters = 2))
    assert(model === again)
    assert(model.m === 4 && model.k === 8 && model.subDim === dim / 4)
  }

  test("every code is in [0, k); encoding is stable across evaluations") {
    val codes = data.select(
      (0 until model.m).map(mi => model.codeCol(col("vec"), mi).as(s"c$mi")): _*)
    val rows = codes.collect()
    rows.foreach(r => (0 until model.m).foreach { mi =>
      assert(r.getInt(mi) >= 0 && r.getInt(mi) < model.k)
    })
    assert(codes.except(data.select(
      (0 until model.m).map(mi => model.codeCol(col("vec"), mi).as(s"c$mi")): _*))
      .count() === 0L)
  }

  test("ADC distance approximates true L2: PQ top-30 recalls most of exact top-10") {
    val q = {
      val rnd = new scala.util.Random(5)
      Seq.fill(dim)(rnd.nextGaussian())
    }
    val exact = data
      .select(col("id"), V.l2Dist(V.asDouble(col("vec")), V.vecLit(q)).as("d"))
      .orderBy(col("d"), col("id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val pq = data
      .select(col("id"), model.adcDistCol(col("vec"), q).as("d"))
      .orderBy(col("d"), col("id")).limit(30)
      .collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(pq).size / 10.0
    assert(recall >= 0.5, s"recall@10-in-30 = $recall")
  }

  test("adcDistCol equals the driver-side LUT replay (expression correctness)") {
    val q = Seq.tabulate(dim)(i => (i % 3) * 0.5 - 0.5)
    val got = data
      .select(col("id"),
        model.adcDistCol(col("vec"), q).as("d"),
        (0 until model.m).map(mi => model.codeCol(col("vec"), mi))
          .reduce[org.apache.spark.sql.Column]((a, b) => a * lit(100) + b).as("packed"))
      .collect()
    got.foreach { r =>
      // unpack codes and replay the LUT sum in plain Scala
      var packed = r.getInt(2)
      val codes = Array.fill(model.m)(0)
      for (mi <- (model.m - 1) to 0 by -1) { codes(mi) = packed % 100; packed /= 100 }
      val want = BigDecimal(codes.zipWithIndex.map { case (c, mi) =>
        model.lutFor(q, mi)(c) }.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(1) - want) < 1e-9, s"id ${r.getLong(0)}")
    }
  }
}
