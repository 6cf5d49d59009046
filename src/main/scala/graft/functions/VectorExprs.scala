package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the similarity/dedup hot paths.
  *
  * Rationale (SURVEY §4's "custom work only where built-ins are weak"):
  * higher-order functions (`zip_with`/`aggregate`/`transform`) are evaluated
  * INTERPRETED — one closure dispatch per array element plus intermediate
  * array materialization. On a 64-dim dot product over hundreds of
  * thousands of candidate pairs, or 16 minhash passes over shingle arrays,
  * that interpretive overhead dominates. These expressions run the same
  * arithmetic as one tight JIT'd loop per row:
  *
  *  - [[DotProductFloat]] — full whole-stage-codegen (`doGenCode` emits the
  *    loop straight into the generated consume path);
  *  - [[WordShingleHashes]] / [[MinHashSig]] — `eval` with a per-row tight
  *    loop (the output is an array, the loop is the whole cost; codegen
  *    would only remove a single virtual call per ROW, so eval is enough).
  *
  * Determinism: DotProductFloat accumulates float→double products
  * sequentially — bit-identical to the `zip_with`+`aggregate` fold it
  * replaces and to the DuckDB oracle's double fold. The hash expressions
  * use XXH64 (the engine of Spark's own xxhash64) — deterministic across
  * runs/partitionings; they back oracle-less keys only.
  */
object VectorExprs {
  /** Sequential-double dot product of two float vectors. */
  def dotf(a: Column, b: Column): Column =
    GraftShim.column(DotProductFloat(
      GraftShim.expression(a), GraftShim.expression(b)))

  /** Distinct XXH64 hashes of n-word shingles of a token array. */
  def shingleHashes(tokens: Column, n: Int): Column =
    GraftShim.column(WordShingleHashes(
      GraftShim.expression(tokens), n))

  /** k-minhash signature of a hashed-shingle array. */
  def minhashSig(hashes: Column, k: Int): Column =
    GraftShim.column(MinHashSig(GraftShim.expression(hashes), k))

  /** |a ∩ b| of two SORTED long arrays (one merge pass, no intermediate
    * array — array_intersect materializes the intersection when only its
    * size is needed). */
  def sortedInterSize(a: Column, b: Column): Column =
    GraftShim.column(SortedIntersectionSize(
      GraftShim.expression(a), GraftShim.expression(b)))

  /** 64-bit SimHash of a token array in ONE pass (vs a 64×-pass nested
    * HOF fold: one scan of the array per output bit). */
  def simhash64(tokens: Column): Column =
    GraftShim.column(SimHash64(GraftShim.expression(tokens)))

  /** k md5 minhash digests of a shingle array in ONE pass (vs k
    * interpreted array_min(transform(md5)) chains). Bit-identical to
    * `array_min(transform(sh, s => md5(concat(lit(s"$i:"), s))))`
    * per i — the engine-portable signature the DuckDB oracle reproduces. */
  def minhashMd5(shingles: Column, k: Int): Column =
    GraftShim.column(MinHashMd5Sigs(GraftShim.expression(shingles), k))

  /** k Kirsch–Mitzenmacher minhashes of a shingle array in ONE pass:
    * ONE md5 per shingle, h_i = h1 + i·h2 over the digest's two leading
    * 32-bit halves — ~1/k of [[minhashMd5]]'s digest work. Bit-identical
    * to the HOF spelling
    * `transform(seq(0,k-1), i => array_min(transform(sh, s =>
    * conv(substr(md5(s),1,8),16,10) + i*conv(substr(md5(s),9,8),16,10))))`
    * and to the DuckDB twin's BIGINT arithmetic (values < 2³⁶ — no
    * overflow anywhere). */
  def minhashKM(shingles: Column, k: Int): Column =
    GraftShim.column(MinHashKMSigs(GraftShim.expression(shingles), k))
}

case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> inputs")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product_float"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Distinct XXH64 hashes of all n-word shingles ("w1 w2 … wn") of a token
  * array — one row-level loop replacing a sequence→transform→element_at→
  * concat_ws→xxhash64→array_distinct interpreted chain. */
case class WordShingleHashes(child: Expression, n: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(n >= 1)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<string> input")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes"

  private val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    val count = m - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long](count * 2)
    var i = 0
    while (i < count) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      val sh = UTF8String.concatWs(space, parts: _*)
      seen.add(XXH64.hashUnsafeBytes(
        sh.getBaseObject, sh.getBaseOffset, sh.numBytes, 42L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator(); var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** Intersection size of two sorted long arrays by a single merge pass.
  * Callers must pre-sort (array_sort) — done once per document, not once
  * per candidate pair. */
case class SortedIntersectionSize(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> inputs")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersection_size"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash over a token array: counter[b] += ±1 by bit b of
  * XXH64(token); sig bit b = sign(counter[b]). One loop over tokens
  * updating 64 counters — the nested-HOF formulation rescans the token
  * array once per bit. Bit order matches the HOF fold it replaced
  * (bit 0 of the hash lands in the MSB). */
case class SimHash64(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<string> input")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    val counters = new Array[Int](64)
    var i = 0
    while (i < m) {
      val t = toks.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(
        t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
      var b = 0
      while (b < 64) {
        counters(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      sig = (sig << 1) | (if (counters(b) > 0) 1L else 0L)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** k minhashes of a long array in ONE pass (vs k interpreted
  * transform+array_min passes): sig(j) = min_h XXH64(h, seed=j). */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(k >= 1)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<bigint> input")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val m = hs.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val h = hs.getLong(i)
      var j = 0
      while (j < k) {
        val mixed = XXH64.hashLong(h, j)
        if (mixed < sig(j)) sig(j) = mixed
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** All k md5 minhash digests of a shingle array in ONE traversal with one
  * reused MessageDigest — replaces k interpreted
  * array_min(transform(sh, s ⇒ md5("i:" ‖ s))) chains (k array scans, a
  * fresh digest and UTF8String concat per call). Semantics are
  * BIT-IDENTICAL to that chain: per i the minimum lowercase-hex digest of
  * the UTF-8 bytes of "i:" + shingle, min taken in binary string order
  * (hex is ASCII, so binary = lexicographic); null shingle elements are
  * skipped exactly as array_min skips the null md5(concat(null)) would
  * produce; an empty array yields k nulls like array_min(empty). The
  * DuckDB oracle reproduces the same digests, so md5-minhash keys stay
  * hash-checked. */
case class MinHashMd5Sigs(child: Expression, k: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(k >= 1)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<string> input")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_md5_sigs"

  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(k)(i => s"$i:".getBytes(java.nio.charset.StandardCharsets.UTF_8))
  private val hexDigits = "0123456789abcdef".toCharArray

  override protected def nullSafeEval(input: Any): Any = {
    val sh = input.asInstanceOf[ArrayData]
    val m = sh.numElements()
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = new Array[String](k)
    var i = 0
    while (i < m) {
      if (!sh.isNullAt(i)) {
        val sBytes = sh.getUTF8String(i).getBytes
        var j = 0
        while (j < k) {
          md.reset()
          md.update(prefixes(j))
          md.update(sBytes)
          val dg = md.digest()
          val hex = new Array[Char](32)
          var b = 0
          while (b < 16) {
            hex(2 * b) = hexDigits((dg(b) >> 4) & 0xf)
            hex(2 * b + 1) = hexDigits(dg(b) & 0xf)
            b += 1
          }
          val hs = new String(hex)
          if (mins(j) == null || hs.compareTo(mins(j)) < 0) mins(j) = hs
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(s =>
      if (s == null) null else UTF8String.fromString(s)))
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** One-pass Kirsch–Mitzenmacher k-minhash ("Less Hashing, Same
  * Performance: Building a Better Bloom Filter", Kirsch & Mitzenmacher,
  * ESA 2006 — public): per shingle ONE md5 digest, h1/h2 = its two
  * leading 32-bit halves read big-endian (exactly
  * `conv(substring(hex, 1, 8), 16, 10)` / `(hex, 9, 8)`), and the k
  * hash functions are h_i = h1 + i·h2. All values < 2³⁶, so the 64-bit
  * arithmetic is exact and portable to engines with strict BIGINT
  * overflow (DuckDB). Returns the k minima over the array (nulls
  * skipped; all-null/empty input → k nulls, matching the
  * array_min-over-empty HOF semantics). */
case class MinHashKMSigs(child: Expression, k: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(k >= 1)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<string> input")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_km_sigs"

  override protected def nullSafeEval(input: Any): Any = {
    val sh = input.asInstanceOf[ArrayData]
    val m = sh.numElements()
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = new Array[Long](k)
    var seen = false
    var i = 0
    while (i < m) {
      if (!sh.isNullAt(i)) {
        md.reset()
        md.update(sh.getUTF8String(i).getBytes)
        val dg = md.digest()
        val h1 = ((dg(0) & 0xffL) << 24) | ((dg(1) & 0xffL) << 16) |
          ((dg(2) & 0xffL) << 8) | (dg(3) & 0xffL)
        val h2 = ((dg(4) & 0xffL) << 24) | ((dg(5) & 0xffL) << 16) |
          ((dg(6) & 0xffL) << 8) | (dg(7) & 0xffL)
        var j = 0
        var h = h1
        if (!seen) {
          while (j < k) { mins(j) = h; h += h2; j += 1 }
          seen = true
        } else {
          while (j < k) { if (h < mins(j)) mins(j) = h; h += h2; j += 1 }
        }
      }
      i += 1
    }
    if (!seen) new GenericArrayData(new Array[Any](k))
    else new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}
