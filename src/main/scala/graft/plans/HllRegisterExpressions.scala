package graft.plans

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** PACKED HyperBall register kernels (round-18 optimization).
  *
  * The round-15 HyperBall kept one ROW per (node, bucket) register:
  * each round's hop join replicated every register row per edge and
  * the merge was a (node, bucket)-keyed MAX over `E * avg_buckets`
  * rows — at saturation (ball size >= m) that is `m` shuffled rows
  * per edge per round, and `m` hash-map entries per node in the
  * aggregate (the spill-bound-aggregate profile at scale).
  *
  * These two kernels pack a node's whole register table into ONE
  * `array<int>` of length m (index = bucket, value = max rho, 0 =
  * absent — hllCells emits rho in [1, 61-p], so 0 is unambiguous):
  *
  *  - [[RegisterMax]]: elementwise-max aggregate over packed tables —
  *    the per-round merge becomes a node-keyed ObjectHashAggregate
  *    whose exchange carries ONE m-byte buffer per edge (serialized
  *    rho-per-slot bytes) instead of up to m 24-byte rows, and whose
  *    map holds one entry per node instead of m. Elementwise max is
  *    commutative/associative, so partial (map-side) aggregation
  *    combines freely and the merged table is bit-identical to the
  *    row form's per-bucket MAX regardless of partitioning or order.
  *  - [[HllRegisterEstimate]]: the integer RAW HLL estimator with the
  *    linear-counting branch, read straight off a packed table as a
  *    SCALAR projection — the per-round `groupBy(node)` estimate
  *    aggregate (one exchange per radius in the row form) disappears
  *    entirely. Arithmetic is exact and engine-portable: the harmonic
  *    sum Σ 2^(60-rho) is accumulated factored by 2^(p-1)
  *    (`Σ 2^(61-p-rho)` <= m * 2^(61-p) = 2^61, exact in a long) and
  *    the single division runs in BigInteger — the same floor the
  *    DECIMAL(38,0) `div` path produced, term for term (all values
  *    positive, both truncate). The linear-counting table is the
  *    caller's [[graft.ops.Graph.lcTable]] literals, branch tests
  *    `n_buckets < m && raw < 5m/2` unchanged on exact integers.
  */
case class RegisterMax(child: Expression,
                       m: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"register_max expects array<int>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "register_max"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(m, arr.numElements())
      var i = 0
      while (i < n) {
        val x = arr.getInt(i)
        if (x > buf(i)) buf(i) = x.toByte // rho <= 60 < Byte.MaxValue
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (b2(i) > b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Int](m)
    var i = 0
    while (i < m) { out(i) = buf(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  // the buffer IS its wire format: m rho bytes, slot = bucket
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(storage: Array[Byte]): Array[Byte] = storage

  override def withNewMutableAggBufferOffset(newOffset: Int): RegisterMax =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RegisterMax =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): RegisterMax =
    copy(child = newChild)
}

/** Integer RAW HLL estimate (+ linear-counting branch) over a packed
  * register array — see the file docstring. `lc` must be
  * `lcTable(p)` (1-indexed in SQL as `element_at(lc, m - n_buckets)`,
  * so `lc(m - nb - 1)` here).
  */
case class HllRegisterEstimate(child: Expression, p: Int, lc: Seq[Long])
    extends UnaryExpression {
  require(p >= 4 && p <= 12, s"p must be in [4, 12], got $p")

  private val m: Int = 1 << p
  // alpha_m as published (the hllEstimate constants, verbatim)
  private val (aNum, aDen): (Long, Long) = p match {
    case 4 => (673L, 1000L)
    case 5 => (697L, 1000L)
    case 6 => (709L, 1000L)
    case _ => (7213L * m, 10000L * m + 10790L)
  }
  // aNum * m^2 * 2^60 — the raw estimator's loop-invariant numerator
  private lazy val numerConst: java.math.BigInteger =
    java.math.BigInteger.valueOf(aNum)
      .multiply(java.math.BigInteger.valueOf(m.toLong * m))
      .shiftLeft(60)
  private lazy val lcArr: Array[Long] = lc.toArray
  private val fiveM2: Long = 5L * m / 2

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_register_est expects array<int>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "hll_register_est"

  private[plans] def estimate(arr: ArrayData): Long = {
    var nb = 0
    var s = 0L
    var i = 0
    while (i < m) {
      val v = arr.getInt(i)
      if (v > 0) nb += 1
      s += 1L << (61 - p - v) // 2^(60-v) factored by 2^(p-1); <= 2^61 total
      i += 1
    }
    val denom = java.math.BigInteger.valueOf(aDen)
      .multiply(java.math.BigInteger.valueOf(s).shiftLeft(p - 1))
    val raw = numerConst.divide(denom).longValue()
    if (nb < m && raw < fiveM2) lcArr(m - nb - 1) else raw
  }

  override def nullSafeEval(v: Any): Any = estimate(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val lcRef = ctx.addReferenceObj("lc", lcArr, "long[]")
      val numRef = ctx.addReferenceObj("numerConst", numerConst,
        "java.math.BigInteger")
      val nb = ctx.freshName("nb")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val raw = ctx.freshName("raw")
      s"""
         |int $nb = 0; long $s = 0L;
         |for (int $i = 0; $i < $m; $i++) {
         |  final int $v = $a.getInt($i);
         |  if ($v > 0) $nb++;
         |  $s += 1L << (${61 - p} - $v);
         |}
         |final long $raw = $numRef.divide(
         |  java.math.BigInteger.valueOf(${aDen}L)
         |    .multiply(java.math.BigInteger.valueOf($s).shiftLeft(${p - 1})))
         |  .longValue();
         |${ev.value} = ($nb < $m && $raw < ${fiveM2}L)
         |  ? $lcRef[$m - $nb - 1] : $raw;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HllRegisterEstimate =
    copy(child = newChild)
}

object HllRegisterExpressions {
  /** Elementwise-max aggregate over packed register arrays. */
  def registerMax(c: Column, m: Int): Column =
    GraftShims.column(
      RegisterMax(GraftShims.expression(c), m).toAggregateExpression())

  /** Scalar RAW+LC estimate off a packed register array. */
  def hllRegisterEst(c: Column, p: Int, lc: Seq[Long]): Column =
    GraftShims.column(HllRegisterEstimate(GraftShims.expression(c), p, lc))
}
