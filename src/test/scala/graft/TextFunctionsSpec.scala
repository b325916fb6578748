package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[A](c: org.apache.spark.sql.Column): A =
    Seq(1).toDF("x").select(c.as("v")).head().getAs[A](0)

  test("portable hash golden: h60('hello') matches DuckDB's hex-prefix cast") {
    // DuckDB: SELECT ('0x'||substring(md5('hello'),1,15))::BIGINT => 419982666956583591
    assert(one[Long](T.h60(lit("hello"))) === 419982666956583591L)
    assert(one[Long](T.h31(lit("hello"))) === 419982666956583591L % T.P31)
  }

  test("tokens split matches single-space semantics") {
    assert(one[scala.collection.Seq[String]](T.tokens(lit("a b  c"))).toSeq
      === Seq("a", "b", "", "c"))
  }

  test("shingles: word bigrams, guarded for short docs") {
    assert(one[scala.collection.Seq[String]](T.shingles(lit("a b c"), 2)).toSeq
      === Seq("a b", "b c"))
    assert(one[scala.collection.Seq[String]](T.shingles(lit("solo"), 2)).toSeq
      === Seq.empty)
  }

  test("char ngrams golden") {
    assert(one[scala.collection.Seq[String]](T.charNgrams(lit("abcd"), 3)).toSeq
      === Seq("abc", "bcd"))
  }

  test("fingerprint: polynomial rolling hash, golden") {
    // "ab": ((0*31+97)%M)*31+98 = 3105
    assert(one[Long](T.fingerprint(lit("ab"))) === 3105L)
  }

  test("minhash signature: contained set has pointwise >= minhashes") {
    val params = T.minhashParams(8)
    val small = array(lit("a b"), lit("b c"))
    val big = array(lit("a b"), lit("b c"), lit("c d"))
    val sSmall = T.minhashSig(small, params).map(one[Long](_))
    val sBig = T.minhashSig(big, params).map(one[Long](_))
    sSmall.zip(sBig).foreach { case (s, b) => assert(s >= b) } // more elements can only lower mins
    assert(sSmall.forall(v => v >= 0 && v < T.P31))
  }

  test("simhash: deterministic, in 16-bit range, identical sets collide") {
    val toks = array(lit("spark"), lit("join"), lit("scan"))
    val a = one[Long](T.simhash(toks, 16))
    val b = one[Long](T.simhash(toks, 16))
    assert(a === b)
    assert(a >= 0 && a < (1 << 16))
  }

  test("predictedLang picks the max-marker language with en-first ties") {
    assert(one[String](T.predictedLang(T.tokens(lit("der und die hund")))) === "de")
    assert(one[String](T.predictedLang(T.tokens(lit("the of and le")))) === "en")
    // all-zero scores -> tie -> preference order picks en
    assert(one[String](T.predictedLang(T.tokens(lit("xyz abc")))) === "en")
  }

  test("qualityScore stays in [0,1]") {
    Seq("the quick brown fox", "x", "a a a a a a a a a a a a").foreach { t =>
      val q = one[Double](T.qualityScore(lit(t)))
      assert(q >= 0.0 && q <= 1.0, s"score $q for '$t'")
    }
  }
}
