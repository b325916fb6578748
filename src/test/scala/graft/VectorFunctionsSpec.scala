package graft

import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}

/** Golden hand-computed distance checks — including the metric-*direction*
  * case the reference's tests miss (its cosine_distance returns
  * similarity, so its "nearest" is least-similar; SURVEY.md §2.3 Q3). */
class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.as("v")).head().getDouble(0)

  test("dot product, golden") {
    val c = V.dot(V.vecLit(Seq(1.0, 2.0, 3.0)), V.vecLit(Seq(4.0, -5.0, 6.0)))
    assert(one(c) === 4.0 - 10.0 + 18.0)
  }

  test("l2 distance, golden") {
    val c = V.l2Dist(V.vecLit(Seq(0.0, 3.0)), V.vecLit(Seq(4.0, 0.0)))
    assert(one(c) === 5.0)
  }

  test("l2 norm, golden") {
    assert(one(V.l2Norm(V.vecLit(Seq(3.0, 4.0)))) === 5.0)
  }

  test("cosine distance: identical vectors -> 0, orthogonal -> 1, opposite -> 2") {
    assert(math.abs(one(V.cosineDist(V.vecLit(Seq(1.0, 0.0)), V.vecLit(Seq(2.0, 0.0))))) < 1e-12)
    assert(math.abs(one(V.cosineDist(V.vecLit(Seq(1.0, 0.0)), V.vecLit(Seq(0.0, 7.0)))) - 1.0) < 1e-12)
    assert(math.abs(one(V.cosineDist(V.vecLit(Seq(1.0, 0.0)), V.vecLit(Seq(-3.0, 0.0)))) - 2.0) < 1e-12)
  }

  test("metric direction: nearest-by-cosineDist is the most similar vector") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(-1.0f, 0.0f, 0.0f)),
      (4L, Seq(0.9f, 0.1f, 0.0f))).toDF("id", "vector")
    val q = Seq(1.0, 0.0, 0.0)
    val top = vecs
      .select(col("id"), V.cosineDist(col("vector"), V.vecLit(q)).as("d"))
      .orderBy(col("d"), col("id"))
      .head()
    assert(top.getLong(0) === 1L) // the reference's inverted metric would pick id=3
  }

  test("native kernels are bit-identical to the HOF formulation") {
    val rng = new scala.util.Random(5)
    val pairs = Seq.fill(50)((Seq.fill(64)(rng.nextGaussian() * 0.15),
      Seq.fill(64)(rng.nextGaussian() * 0.15)))
    pairs.foreach { case (a, b) =>
      val (va, vb) = (V.vecLit(a), V.vecLit(b))
      assert(one(V.dot(va, vb)) === one(V.dotHof(va, vb)))     // exact ==
      assert(one(V.l2Dist(va, vb)) === one(V.l2DistHof(va, vb)))
    }
  }

  test("quantAudit kernel is bit-identical to the HOF twin, incl. edge vectors") {
    def pair(c: org.apache.spark.sql.Column): (Long, Double) = {
      val r = Seq(1).toDF("x").select(c.getField("abs_q").as("a"), c.getField("err").as("e")).head()
      (r.getLong(0), r.getDouble(1))
    }
    val rng = new scala.util.Random(7)
    val vecs = Seq.fill(40)(Seq.fill(64)(rng.nextGaussian() * 0.15)) ++ Seq(
      Seq.fill(8)(0.0),               // all-zero: guarded scale
      Seq(-0.5, 0.5, 1.5, -1.5),      // negative halves: HALF_UP vs Math.round
      Seq(1e-300, -1e-300, 1.0),      // denormal-ish magnitudes
      Seq(0.1))                       // scale lands q on an exact half
    vecs.foreach { v =>
      assert(pair(V.quantAudit(V.vecLit(v))) === pair(V.quantAuditHof(V.vecLit(v))))
    }
    // round semantics: -2.5 must go AWAY from zero like Spark round()
    assert(graft.expressions.VectorKernels.sparkRound0(-2.5) === -3.0)
    assert(graft.expressions.VectorKernels.sparkRound0(2.5) === 3.0)
    assert(graft.expressions.VectorKernels.sparkRound0(0.49999999999999994) === 0.0)
    // non-finite inputs pass through like Spark's Round (no
    // NumberFormatException from BigDecimal.valueOf)
    assert(graft.expressions.VectorKernels.sparkRound0(Double.NaN).isNaN)
    assert(graft.expressions.VectorKernels.sparkRound0(Double.PositiveInfinity)
      === Double.PositiveInfinity)
    // a corrupt (non-finite) element fails LOUDLY like the HOF twin's
    // ANSI cast, never as a silent 0
    intercept[ArithmeticException] {
      graft.expressions.VectorKernels.quantAudit(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Array(1.0, Double.PositiveInfinity)))
    }
  }

  test("registered SQL functions: vector_dot / vector_sq_l2 usable from spark.sql") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT vector_dot(array(1.0, 2.0), array(3.0, 4.0)) AS d, " +
        "vector_sq_l2(array(0.0, 3.0), array(4.0, 0.0)) AS s").head()
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 25.0)
    Tables.embeddings(spark, "/root/testdata/sf0.001")
      .createOrReplaceTempView("graft_emb")
    val viaSql = spark.sql("SELECT vec_id, lsh_shard(embedding) AS s FROM graft_emb")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaCol = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), graft.functions.Lsh.default.shardCol(col("embedding")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaSql === viaCol) // registry expression == Column DSL expression
    assert(viaSql.values.forall(s => s >= 0 && s < 256))
  }

  test("signPack kernel === static expression twin === driver-side fold") {
    def oneL(c: org.apache.spark.sql.Column): Long =
      Seq(1).toDF("x").select(c.as("v")).head().getLong(0)
    val rng = new scala.util.Random(11)
    for (_ <- 1 to 20) {
      val v = Seq.fill(64)(rng.nextGaussian() * 0.2)
      val k = oneL(V.signPack(V.vecLit(v)))
      assert(k === oneL(V.signPackStatic(V.vecLit(v), 64)))
      assert(k === V.signPackOf(v))
    }
    // short vector: only the present dims contribute
    assert(oneL(V.signPack(V.vecLit(Seq(1.0, -1.0, 0.5)))) === 5L)
  }

  test("registered SQL text kernels: shingle_hash31 / hashes31 / simhash64") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT shingle_hash31('a b c', 2) AS sh, " +
        "simhash64(hashes31(array('x', 'y')), 16) AS f").head()
    // same contract as the Column DSL
    val expect = Seq(1).toDF("x").select(
      graft.functions.TextFunctions.shingleHashes(lit("a b c"), 2).as("sh"),
      graft.functions.TextFunctions.simhashFromHashes(
        graft.functions.TextFunctions.hashes31(array(lit("x"), lit("y"))), 16).as("f")).head()
    assert(r.getSeq[Long](0) === expect.getSeq[Long](0))
    assert(r.getLong(1) === expect.getLong(1))
  }

  test("float arrays are cast exactly to double") {
    val c = V.dot(
      array(lit(0.5f), lit(0.25f)).cast("array<float>"),
      V.vecLit(Seq(2.0, 4.0)))
    assert(one(c) === 2.0)
  }
}
