package graft

import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => V}
import graft.operators.RandomProjection

class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  private val inDim = 32
  private val outDim = 8

  test("matrix is deterministic per seed and shaped outDim × inDim") {
    val a = RandomProjection.matrix(inDim, outDim, seed = 7)
    val b = RandomProjection.matrix(inDim, outDim, seed = 7)
    val c = RandomProjection.matrix(inDim, outDim, seed = 8)
    assert(a === b)
    assert(a !== c)
    assert(a.length === outDim && a.forall(_.length === inDim))
  }

  test("JL property: projected distances track original distances on average") {
    val rnd = new scala.util.Random(19)
    val vecs = Seq.fill(80)(Seq.fill(inDim)(rnd.nextGaussian().toFloat))
    // gaussian clouds are nearly equidistant in high dim, so the
    // correlation signal needs the fuller 16-dim projection to clear
    // the bar decisively (outDim 8 sits right at the noise floor)
    val m = RandomProjection.matrix(inDim, 16)
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")
      .select(col("id"), V.asDouble(col("vec")).as("vec"),
        RandomProjection.projectCol(col("vec"), m).as("p"))
    val a = df.select(col("id").as("a_id"), col("vec").as("a_v"), col("p").as("a_p"))
    val b = df.select(col("id").as("b_id"), col("vec").as("b_v"), col("p").as("b_p"))
    val pairs = a.join(b, col("a_id") < col("b_id"))
      .select(V.l2Dist(col("a_v"), col("b_v")).as("d"),
        V.l2Dist(col("a_p"), col("b_p")).as("dp"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    // Pearson correlation between original and projected distances:
    // with outDim 8 the JL distortion is wide per pair but the overall
    // ordering signal must be clearly positive
    val n = pairs.length
    val (xs, ys) = (pairs.map(_._1), pairs.map(_._2))
    val (mx, my) = (xs.sum / n, ys.sum / n)
    val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val r = cov / math.sqrt(
      xs.map(x => (x - mx) * (x - mx)).sum * ys.map(y => (y - my) * (y - my)).sum)
    assert(r > 0.5, s"distance correlation $r")
  }

  test("projectQuery literals replay the expression projection bit-for-bit after rounding") {
    val m = RandomProjection.matrix(inDim, outDim)
    // float-truncate up front: the stored vector column is float, so the
    // driver replay must start from the same float-rounded values
    val q = Seq.tabulate(inDim)(i => math.sin(i * 1.7).toFloat.toDouble)
    val viaExpr = Seq(Tuple1(q.map(_.toFloat))).toDF("vec")
      .select(RandomProjection.projectCol(V.asDouble(col("vec")), m).as("p"))
      .head().getSeq[Double](0)
    val viaDriver = RandomProjection.projectQuery(q, m)
    viaExpr.zip(viaDriver).foreach { case (e, d) =>
      assert(math.abs(e - d) < 5e-7, "rounded literal must stay within 6dp of the expression")
    }
  }
}
