package graft.plans

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared static kernels for the text-hash expressions. Every function
  * is exact integer arithmetic over md5-derived 32-bit token hashes —
  * the same values the built-in composition
  * (`conv(substring(md5(w),1,8),16,10)` = first 4 digest bytes as an
  * unsigned int) and the DuckDB oracle derive — so swapping a kernel in
  * cannot move a hash in the correctness gate.
  */
object TextHashKernels {
  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 md5 hex digits of the UTF-8 bytes as an unsigned 32-bit
    * value (== Pipeline.wordHash32).
    */
  def hash32(bytes: Array[Byte]): Long = {
    val md = mdPool.get()
    md.reset()
    val dig = md.digest(bytes)
    ((dig(0) & 0xFFL) << 24) | ((dig(1) & 0xFFL) << 16) |
      ((dig(2) & 0xFFL) << 8) | (dig(3) & 0xFFL)
  }

  /** Element-wise hash32 over an array<string>; null elements stay null. */
  def hash32Array(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) out(i) = hash32(arr.getUTF8String(i).getBytes)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** k-permutation MinHash signature over the SHINGLE STRINGS: one md5
    * per shingle, its first two 32-bit words mixed into a base hash
    * x = (65599*w0 + w1) mod P; permutation j takes min over shingles
    * of (a_j*x + b_j) mod P with P = 2^31-1 and the constants of
    * Pipeline.minhashA/minhashB. a_j*x wraps the prime modulus ~2^31
    * times — a genuine permutation of Z_P per j (the wrap is
    * load-bearing: any order-preserving map collapses all k argmins to
    * one shingle, see Pipeline.minhashA). Products stay under 2^62, so
    * the arithmetic is exact in signed 64-bit — identical to the HOF
    * reference and the oracle's list_min/list_transform. An empty (or
    * all-null) input yields nulls, matching array_min over an empty
    * transform.
    */
  def minhashSig(shingles: ArrayData, k: Int): ArrayData = {
    val p = graft.Pipeline.MinhashP
    val md = mdPool.get()
    val n = shingles.numElements()
    // one digest pass: base hash per shingle (-1 marks null slots)
    val base = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (shingles.isNullAt(i)) base(i) = -1L
      else {
        md.reset()
        val d = md.digest(shingles.getUTF8String(i).getBytes)
        val w0 = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
          ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
        val w1 = ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
          ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
        base(i) = graft.Pipeline.minhashBase(w0, w1)
      }
      i += 1
    }
    val out = new Array[Any](k)
    var j = 0
    while (j < k) {
      val a = graft.Pipeline.minhashA(j)
      val b = graft.Pipeline.minhashB(j)
      var min = Long.MaxValue
      var seen = false
      i = 0
      while (i < n) {
        if (base(i) >= 0) {
          // operands positive, product < 2^62: % == pmod, no overflow
          val v = (a * base(i) + b) % p
          if (v < min) { min = v; seen = true }
        }
        i += 1
      }
      if (seen) out(j) = min
      j += 1
    }
    new GenericArrayData(out)
  }

  private val ShingleSep = UTF8String.fromString(" ")

  /** Distinct word n-gram shingles ("a b c" style) in first-occurrence
    * order — one pass, one LinkedHashSet, vs the HOF composition
    * (sequence + per-shingle concat_ws lambda + array_distinct, all
    * interpreted per element). Byte-identical strings to the HOF form
    * (concat_ws semantics incl. null-part skipping via
    * UTF8String.concatWs — the same kernel concat_ws compiles to).
    * Fewer than n tokens yield an empty array; callers guard
    * size >= n anyway (the HOF form's sequence() is invalid there).
    */
  def wordShingles(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i + n <= len) {
      val parts = new Array[UTF8String](n)
      var k = 0
      while (k < n) {
        parts(k) = if (arr.isNullAt(i + k)) null else arr.getUTF8String(i + k)
        k += 1
      }
      seen.add(UTF8String.concatWs(ShingleSep, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  /** Polynomial rolling hash over an array<string>'s token hashes:
    * fold (acc*31 + hash32(t) mod M) mod M with M = 1e9+7, acc from 0 —
    * identical to the HOF fold (all operands non-negative, so % == pmod)
    * and the oracle's init-less list_reduce.
    */
  def rollingHash(arr: ArrayData): Long = {
    val m = 1000000007L
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      // a null token would null the whole HOF fold; token arrays from
      // split() never contain nulls, so treat it as hash 0 defensively
      val h = if (arr.isNullAt(i)) 0L else hash32(arr.getUTF8String(i).getBytes) % m
      acc = (acc * 31 + h) % m
      i += 1
    }
    acc
  }
}

/** Base for the one-pass array-kernel expressions below: array<string>
  * (or array<long>) in, static-kernel call in codegen so the expression
  * stays inside whole-stage codegen. Round 2 evaluated these as
  * higher-order-function lambdas — interpreted per ELEMENT, with one
  * md5 Column-expression eval per shingle/token — which made the
  * MinHash family (q26/q27) the slowest remaining bench queries.
  */
abstract class TextKernelExpression extends UnaryExpression {
  protected def expects: DataType
  protected def kernelCall(a: String): String

  // nullability-insensitive type match (DataType.sameType is private[sql])
  private def matches(dt: DataType, want: DataType): Boolean = (dt, want) match {
    case (ArrayType(a, _), ArrayType(b, _)) => matches(a, b)
    case (a, b) => a == b
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (matches(child.dataType, expects)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ${expects.simpleString}, got ${child.dataType.simpleString}")

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, kernelCall)
}

/** Element-wise md5-derived 32-bit hash: array<string> -> array<long>
  * (native form of `transform(arr, w => wordHash32(w))`).
  */
case class Md5Hash32Array(child: Expression) extends TextKernelExpression {
  override protected def expects: DataType = ArrayType(StringType)
  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "md5_hash32_array"
  override def nullSafeEval(a: Any): Any =
    TextHashKernels.hash32Array(a.asInstanceOf[ArrayData])
  override protected def kernelCall(a: String): String =
    s"graft.plans.TextHashKernels.hash32Array($a)"
  override protected def withNewChildInternal(newChild: Expression): Md5Hash32Array =
    copy(child = newChild)
}

/** k-permutation MinHash signature: array<string> shingles ->
  * array<long>[k] (native form of Pipeline.minhashSignature).
  */
case class MinhashSignature(child: Expression, k: Int) extends TextKernelExpression {
  override protected def expects: DataType = ArrayType(StringType)
  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(a: Any): Any =
    TextHashKernels.minhashSig(a.asInstanceOf[ArrayData], k)
  override protected def kernelCall(a: String): String =
    s"graft.plans.TextHashKernels.minhashSig($a, $k)"
  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

/** Distinct word n-gram shingles: array<string> -> array<string>
  * (native form of Pipeline.wordShingles).
  */
case class WordShingles(child: Expression, n: Int) extends TextKernelExpression {
  override protected def expects: DataType = ArrayType(StringType)
  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "word_shingles"
  override def nullSafeEval(a: Any): Any =
    TextHashKernels.wordShingles(a.asInstanceOf[ArrayData], n)
  override protected def kernelCall(a: String): String =
    s"graft.plans.TextHashKernels.wordShingles($a, $n)"
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Polynomial rolling hash mod 1e9+7: array<string> -> long (native
  * form of Pipeline.rollingHash).
  */
case class RollingHash(child: Expression) extends TextKernelExpression {
  override protected def expects: DataType = ArrayType(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"
  override def nullSafeEval(a: Any): Any =
    TextHashKernels.rollingHash(a.asInstanceOf[ArrayData])
  override protected def kernelCall(a: String): String =
    s"graft.plans.TextHashKernels.rollingHash($a)"
  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object TextExpressions {
  def md5Hash32Array(arr: Column): Column =
    GraftShims.column(Md5Hash32Array(GraftShims.expression(arr)))

  def minhashSig(shingles: Column, k: Int): Column =
    GraftShims.column(MinhashSignature(GraftShims.expression(shingles), k))

  def rollingHash(tokens: Column): Column =
    GraftShims.column(RollingHash(GraftShims.expression(tokens)))

  def wordShingles(tokens: Column, n: Int): Column =
    GraftShims.column(WordShingles(GraftShims.expression(tokens), n))
}
