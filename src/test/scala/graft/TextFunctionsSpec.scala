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

  test("fused kernels are bit-identical to their HOF twins") {
    // a realistic shingle set: hashed once, then sig + simhash both ways
    val shingles = array((1 to 40).map(i => lit(s"tok$i tok${i + 1}")): _*)
    val hsKernel = one[scala.collection.Seq[Long]](T.hashes31(shingles))
    val hsHof = one[scala.collection.Seq[Long]](T.hashes31Hof(shingles))
    assert(hsKernel.toSeq === hsHof.toSeq)

    val params = T.minhashParams(16)
    val sigKernel = one[scala.collection.Seq[Long]](T.minhashSigArr(T.hashes31(shingles), params))
    val sigHof = T.minhashSigFromHashes(T.hashes31Hof(shingles), params).map(one[Long](_))
    assert(sigKernel.toSeq === sigHof)

    val shKernel = one[Long](T.simhashFromHashes(T.hashes31(shingles), 16))
    val shHof = one[Long](T.simhashFromHashesHof(T.hashes31Hof(shingles), 16))
    assert(shKernel === shHof)
  }

  test("fingerprint kernel === HOF rolling-hash composition") {
    for (text <- Seq("ab", "", "a", "the quick brown fox", "x y z 123")) {
      assert(one[Long](T.fingerprint(lit(text))) ===
        one[Long](T.fingerprintHof(lit(text))), s"text='$text'")
    }
  }

  test("kernels match HOF twins on non-ASCII text (incl. astral plane)") {
    val texts = Seq("héllo wörld héllo", "日本語 テスト 日本語", "mixé ascii 字 and 𝄞 music 𝄞")
    for (text <- texts) {
      assert(one[Long](T.fingerprint(lit(text))) ===
        one[Long](T.fingerprintHof(lit(text))), s"fingerprint '$text'")
      assert(one[scala.collection.Seq[Long]](T.shingleHashes(lit(text), 2)).toSeq ===
        one[scala.collection.Seq[Long]](
          T.hashes31Hof(array_distinct(T.shingles(lit(text), 2)))).toSeq,
        s"shingles '$text'")
      assert(one[scala.collection.Seq[Long]](T.charNgramHashes(lit(text), 3)).toSeq ===
        one[scala.collection.Seq[Long]](
          transform(array_distinct(T.charNgrams(lit(text), 3)), x => T.h60(x))).toSeq,
        s"charNgrams '$text'")
    }
  }

  test("markerCount kernel === HOF filter/array_contains composition") {
    val words = T.langMarkers.flatMap(_._2)
    for (text <- Seq("the der el le mix", "no markers here at all", "", "the the the")) {
      val k = one[Int](T.markerCount(T.tokens(lit(text)), words))
      val h = one[Int](T.markerCountHof(T.tokens(lit(text)), words))
      assert(k === h, s"text='$text'")
    }
  }

  test("charNgramHashes kernel === h60 over distinct charNgrams composition") {
    for (text <- Seq("abcdefg", "ab", "", "aaaa", "spark scan")) {
      val kernel = one[scala.collection.Seq[Long]](T.charNgramHashes(lit(text), 3))
      val composed = one[scala.collection.Seq[Long]](
        transform(array_distinct(T.charNgrams(lit(text), 3)), x => T.h60(x)))
      assert(kernel.toSeq === composed.toSeq, s"text='$text'")
    }
  }

  test("shingleHashes kernel === hashes31(array_distinct(shingles)) composition") {
    for (text <- Seq("a b c d a b c", "single", "", "x  y  x  y", "a b a b a b")) {
      val kernel = one[scala.collection.Seq[Long]](T.shingleHashes(lit(text), 2))
      val composed = one[scala.collection.Seq[Long]](
        T.hashes31Hof(array_distinct(T.shingles(lit(text), 2))))
      assert(kernel.toSeq === composed.toSeq, s"text='$text'")
    }
  }

  test("shingleHashes60 kernel === h60 over distinct shingles composition") {
    for (text <- Seq("a b c d a b c", "one two", "", "x  y  x  y", "a b a b a b")) {
      val kernel = one[scala.collection.Seq[Long]](T.shingleHashes60(lit(text), 3))
      val composed = one[scala.collection.Seq[Long]](
        transform(array_distinct(T.shingles(lit(text), 3)), x => T.h60(x)))
      assert(kernel.toSeq === composed.toSeq, s"text='$text'")
    }
  }

  test("fused kernels: empty-set semantics match the HOF forms") {
    val empty = array().cast("array<string>")
    assert(one[scala.collection.Seq[Long]](T.hashes31(empty)).toSeq === Seq.empty)
    // array_min over empty → null per signature slot
    val params = T.minhashParams(4)
    val sig = Seq(1).toDF("x")
      .select(T.minhashSigArr(T.hashes31(empty), params).as("v"))
      .head().getSeq[Any](0)
    assert(sig === Seq(null, null, null, null))
    assert(one[Long](T.simhashFromHashes(T.hashes31(empty), 16)) === 0L)
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
