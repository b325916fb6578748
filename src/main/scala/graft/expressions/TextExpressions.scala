package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused text-hash kernels as native Catalyst expressions.
  *
  * Spark's higher-order functions (`transform`, `filter`) evaluate their
  * lambda INTERPRETED, per element — for the dedup family that is
  * hundreds of interpreted expression-tree walks per document (k MinHash
  * passes × |shingle set|, `bits` SimHash passes × |token set|). These
  * kernels do the identical arithmetic in one tight primitive loop and
  * keep the operator inside whole-stage codegen.
  *
  * The portable-hash contract is unchanged and equivalence-tested
  * against the HOF twins (TextFunctionsSpec) and the DuckDB oracle:
  *   h60(s) = int64(first 15 hex chars of md5(utf8(s)))
  *          = (big-endian int64 of md5 bytes 0..7) >>> 4
  *   h31(s) = h60(s) % 2147483647
  * Array elements are assumed non-null (they come from split/transform
  * over non-null text — same posture as the vector kernels).
  */
object TextKernels {
  val P31 = 2147483647L
  val FpMod = 1000000007L

  /** First-15-hex-chars md5 as a 60-bit value, shared by eval and
    * codegen (== int64 of the first 15 hex chars of the digest). */
  def md5h60(bytes: Array[Byte], md: MessageDigest): Long = {
    md.reset()
    val d = md.digest(bytes)
    var be = 0L
    var i = 0
    while (i < 8) { be = (be << 8) | (d(i) & 0xffL); i += 1 }
    be >>> 4
  }

  /** [[md5h60]] reduced mod P31 (MinHash arithmetic stays < 2^62). */
  def md5h31(bytes: Array[Byte], md: MessageDigest): Long =
    md5h60(bytes, md) % P31

  private val localMd = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  def threadMd5(): MessageDigest = localMd.get()

  /** Word set for [[MarkerCountExpr]] — built once per generated class. */
  def toUtf8Set(words: Array[String]): java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = {
    val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](words.length * 2)
    words.foreach(w => s.add(org.apache.spark.unsafe.types.UTF8String.fromString(w)))
    s
  }

  /** Fused shingle→distinct→hash used by [[ShingleHash31Expr]]'s eval
    * AND generated code: single-space tokenize (keeping empties, the
    * `split(text, " ")` contract), word n-grams space-joined, string-level
    * first-occurrence dedup, md5-h31 each — byte-identical to
    * `hashes31(array_distinct(shingles(text, n)))`. */
  def shingleHash31(text: org.apache.spark.unsafe.types.UTF8String, n: Int): GenericArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(new Array[Long](0))
    val md = threadMd5()
    val seen = new java.util.HashSet[String]()
    val out = new java.util.ArrayList[java.lang.Long](toks.length)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val s = sb.toString
      if (seen.add(s)) {
        out.add(md5h31(s.getBytes("UTF-8"), md))
      }
      i += 1
    }
    val arr = new Array[Long](out.size())
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    new GenericArrayData(arr)
  }

  /** Fused shingle→distinct→h60 used by [[ShingleHash60Expr]] — the
    * 60-bit twin of [[shingleHash31]] for operators that only need
    * equality (boilerplate frequency, containment): 60 bits makes
    * cross-engine collision divergence negligible at corpus scale where
    * 31 bits would collide routinely. */
  def shingleHash60(text: org.apache.spark.unsafe.types.UTF8String, n: Int): GenericArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(new Array[Long](0))
    val md = threadMd5()
    val seen = new java.util.HashSet[String]()
    val out = new java.util.ArrayList[java.lang.Long](toks.length)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val s = sb.toString
      if (seen.add(s)) {
        out.add(md5h60(s.getBytes("UTF-8"), md))
      }
      i += 1
    }
    val arr = new Array[Long](out.size())
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    new GenericArrayData(arr)
  }

  /** Fused char-n-gram → distinct → h60 used by [[CharNgramHash60Expr]]:
    * code-point n-grams (matching Spark/DuckDB `substring` character
    * semantics), string-level first-occurrence dedup, 60-bit md5 hash —
    * h60 rather than h31 because Jaccard only needs equality and 60 bits
    * makes cross-engine collision divergence negligible. */
  def charNgramHash60(text: org.apache.spark.unsafe.types.UTF8String, n: Int): GenericArrayData = {
    val cps = text.toString.codePoints().toArray
    if (cps.length < n) return new GenericArrayData(new Array[Long](0))
    val md = threadMd5()
    val seen = new java.util.HashSet[String]()
    val out = new java.util.ArrayList[java.lang.Long](cps.length)
    var i = 0
    while (i <= cps.length - n) {
      val g = new String(cps, i, n)
      if (seen.add(g)) out.add(md5h60(g.getBytes("UTF-8"), md))
      i += 1
    }
    val arr = new Array[Long](out.size())
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    new GenericArrayData(arr)
  }
}

/** `array<string> → array<long>`: h31 of every element — the fused form
  * of `transform(set, x => h31(x))` where h31 is the md5-based portable
  * hash ([[graft.functions.TextFunctions.h31]]). One MessageDigest per
  * thread, no per-element expression-tree interpretation, no
  * hex-string/`conv` round-trip (the 60-bit value is read straight off
  * the digest bytes). */
case class Hashes31Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashes31"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hashes31 needs array<string>, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    val md = TextKernels.threadMd5()
    var i = 0
    while (i < n) {
      out(i) = TextKernels.md5h31(arr.getUTF8String(i).getBytes, md)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mdClass = "java.security.MessageDigest"
    val md = ctx.addMutableState(mdClass, "md5",
      v => s"""try { $v = $mdClass.getInstance("MD5"); } catch (Exception e) { throw new RuntimeException(e); }""")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = graft.expressions.TextKernels.md5h31(
         |    $a.getUTF8String($i).getBytes(), $md);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `string → array<long>`: word-n-gram shingles, string-level
  * first-occurrence dedup, md5-h31 per shingle — all in one pass. The
  * composed form (`hashes31(array_distinct(shingles(text, n)))`) walks
  * an interpreted `transform` lambda with `concat_ws`/`element_at` per
  * shingle and allocates the intermediate string array twice; this was
  * the dominant cost of the MinHash pipeline after the hash kernel
  * landed. Byte-identical output (equivalence-tested). */
case class ShingleHash31Expr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash31"

  override def nullSafeEval(input: Any): Any =
    TextKernels.shingleHash31(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.TextKernels.shingleHash31($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `string → array<long>`: word-n-gram shingles, string-level
  * first-occurrence dedup, md5-h60 per shingle in one pass — the 60-bit
  * twin of [[ShingleHash31Expr]] (same fused walk, full-width hash) for
  * equality-only consumers where 31-bit collisions would matter at
  * corpus scale. */
case class ShingleHash60Expr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash60"

  override def nullSafeEval(input: Any): Any =
    TextKernels.shingleHash60(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.TextKernels.shingleHash60($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `string → array<long>`: distinct char n-grams hashed to 60-bit md5
  * values in one pass — the fused form of
  * `transform(array_distinct(charNgrams(text, n)), h60)`. Used for
  * n-gram Jaccard: integer intersections beat string intersections and
  * the interpreted per-gram lambda disappears. */
case class CharNgramHash60Expr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_ngram_hash60"

  override def nullSafeEval(input: Any): Any =
    TextKernels.charNgramHash60(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.TextKernels.charNgramHash60($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<long> → array<long>` (length k): the full MinHash signature in
  * ONE pass over the hash set — the fused form of k separate
  * `array_min(transform(hs, x => (aⱼ·x + bⱼ) % P31))` columns (k
  * interpreted array walks per row). Empty input yields k nulls, exactly
  * like `array_min` over an empty array. */
case class MinhashSigExpr(child: Expression, as: Seq[Long], bs: Seq[Long])
    extends UnaryExpression {
  require(as.length == bs.length && as.nonEmpty)
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val k = as.length
    if (n == 0) return new GenericArrayData(new Array[Any](k))
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = arr.getLong(i)
      var j = 0
      while (j < k) {
        val v = (as(j) * x + bs(j)) % TextKernels.P31
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = as.length
    val aArr = ctx.addReferenceObj("minhashA", as.toArray, "long[]")
    val bArr = ctx.addReferenceObj("minhashB", bs.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[$k]);
         |} else {
         |  long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $x = $a.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = ($aArr[$j] * $x + $bArr[$j]) % ${TextKernels.P31}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `string → long`: polynomial rolling-hash document fingerprint
  * h ← (h·31 + codepoint) mod 1e9+7, left-to-right over the text — the
  * fused form of `aggregate(transform(split(text, ''), ascii), 0, …)`
  * which walks TWO interpreted lambdas per character. Code-point
  * iteration matches `ascii()`/DuckDB semantics. */
case class FingerprintExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "doc_fingerprint"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % TextKernels.FpMod
      i += Character.charCount(cp)
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val s = ctx.freshName("s")
    val i = ctx.freshName("i")
    val cp = ctx.freshName("cp")
    val h = ctx.freshName("h")
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |java.lang.String $s = $a.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $h = ($h * 31L + $cp) % ${TextKernels.FpMod}L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $h;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<string> → int`: how many elements are in a fixed marker-word
  * set — the fused form of `size(filter(toks, t => array_contains(...)))`
  * whose lambda runs interpreted per token (language-ID evaluates it
  * once per candidate language per document). Hash-set membership on
  * UTF8String, no per-token tree walks. */
case class MarkerCountExpr(child: Expression, words: Seq[String])
    extends UnaryExpression {
  require(words.nonEmpty)
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "marker_count"

  @transient private lazy val set = TextKernels.toUtf8Set(words.toArray)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) { if (set.contains(arr.getUTF8String(i))) c += 1; i += 1 }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wordsRef = ctx.addReferenceObj("markerWords", words.toArray, "java.lang.String[]")
    val setVar = ctx.addMutableState("java.util.HashSet", "markerSet",
      v => s"$v = graft.expressions.TextKernels.toUtf8Set($wordsRef);")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |int $n = $a.numElements();
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($setVar.contains($a.getUTF8String($i))) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<long> → long`: `bits`-bit SimHash in one pass — the fused form
  * of `bits` separate `size(filter(hs, x => (x >> k) % 2 == 1))`
  * interpreted walks. Bit k is set iff strictly more than half the
  * hashes have bit k set (2·count > n); an empty set yields 0. */
case class SimhashExpr(child: Expression, bits: Int) extends UnaryExpression {
  require(bits > 0 && bits <= 62)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val cnt = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val x = arr.getLong(i)
      var k = 0
      while (k < bits) { cnt(k) += ((x >> k) & 1L).toInt; k += 1 }
      i += 1
    }
    var r = 0L
    var k = 0
    while (k < bits) { if (2 * cnt(k) > n) r |= (1L << k); k += 1 }
    r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val x = ctx.freshName("x")
      val cnt = ctx.freshName("cnt")
      val r = ctx.freshName("r")
      s"""
         |int $n = $a.numElements();
         |int[] $cnt = new int[$bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $x = $a.getLong($i);
         |  for (int $k = 0; $k < $bits; $k++) { $cnt[$k] += (int) (($x >> $k) & 1L); }
         |}
         |long $r = 0L;
         |for (int $k = 0; $k < $bits; $k++) { if (2 * $cnt[$k] > $n) $r |= (1L << $k); }
         |${ev.value} = $r;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
