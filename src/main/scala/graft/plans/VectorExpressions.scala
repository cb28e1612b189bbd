package graft.plans

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}

/** Native Catalyst expression for cosine similarity over two
  * `array<double>` columns — the hot kernel of the similarity-search /
  * embedding-dedup operators (PipelineQueries q29-q31).
  *
  * One fused whole-stage-codegen loop computes dot(a,b), |a|^2, |b|^2
  * in a single pass over the arrays — vs the built-in composition
  * (3 x zip_with/aggregate lambda folds) which allocates an
  * intermediate array and evaluates 3 higher-order functions per row.
  *
  * Accumulation is in ascending index order per accumulator, so results
  * are IEEE-bit-identical to the sequential-fold reference
  * (Pipeline.dot/cosine) and to the DuckDB oracle — swapping this in
  * changes nothing in the correctness gate.
  *
  * Null semantics: null array -> null result (BinaryExpression default);
  * array ELEMENTS are assumed non-null (embedding vectors).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = $a.getDouble($i);
         |  final double $y = $b.getDouble($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Native random-hyperplane LSH bucket: `planes` sign-projections of an
  * `array<double>` vector folded into one codegen loop, with the ±1
  * hyperplane components embedded as a literal flat array (sign for
  * (plane p, dim d) at index p*dims + d-1 — the same md5-parity values
  * Pipeline.rhpSign derives and the DuckDB oracle replays in SQL).
  *
  * Replaces the HOF composition (planes × zip_with+aggregate lambda
  * folds, interpreted per element — the round-2 bench's #1 hot spot on
  * q30/q31) with a single whole-stage-codegen kernel. Each plane's
  * projection accumulates in ascending index order, so results are
  * IEEE-bit-identical to the sequential HOF fold and the oracle —
  * swapping this in cannot move a hash in the correctness gate.
  *
  * Degenerate inputs are LOUD, not silently bucketed: a vector with
  * fewer than `dims` elements, or any null element in the first `dims`,
  * yields NULL (matching the HOF zip_with form's null propagation). In
  * decontamination a quiet wrong bucket means silently missed
  * contamination — a NULL bucket never equi-joins, and surfaces in any
  * null-count audit of the bucket column.
  */
case class RhpBucket(child: Expression, dims: Int, planes: Int)
    extends UnaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rhp_bucket expects array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "rhp_bucket"

  // flat [plane][dim] sign matrix; recomputed after deserialization
  // (deterministic md5 parity), never shipped inside the plan string
  @transient private lazy val signs: Array[Double] =
    Array.tabulate(planes * dims)(i => graft.Pipeline.rhpSign(i / dims, i % dims + 1))

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (v.numElements() < dims) return null
    var d0 = 0
    while (d0 < dims) { if (v.isNullAt(d0)) return null; d0 += 1 }
    val s = signs
    var bucket = 0
    var p = 0
    while (p < planes) {
      var proj = 0.0
      val base = p * dims
      var d = 0
      while (d < dims) { proj += v.getDouble(d) * s(base + d); d += 1 }
      if (proj > 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.addReferenceObj("rhpSigns", signs, "double[]")
      val bucket = ctx.freshName("bucket")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val dn = ctx.freshName("dn")
      val proj = ctx.freshName("proj")
      val base = ctx.freshName("base")
      val hasNull = ctx.freshName("hasNull")
      s"""
         |boolean $hasNull = $a.numElements() < $dims;
         |for (int $dn = 0; !$hasNull && $dn < $dims; $dn++) {
         |  if ($a.isNullAt($dn)) $hasNull = true;
         |}
         |if ($hasNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $bucket = 0;
         |  for (int $p = 0; $p < $planes; $p++) {
         |    double $proj = 0.0;
         |    final int $base = $p * $dims;
         |    for (int $d = 0; $d < $dims; $d++) {
         |      $proj += $a.getDouble($d) * $s[$base + $d];
         |    }
         |    if ($proj > 0) $bucket |= (1 << $p);
         |  }
         |  ${ev.value} = $bucket;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RhpBucket =
    copy(child = newChild)
}

/** Shared kernel for [[SimHash32]]: one pass over the token array,
  * md5-derived 32-bit hash per token (identical to Pipeline.wordHash32 =
  * first 8 md5 hex digits as an unsigned int), ±1 vote per bit, bit set
  * where votes are positive. Integer arithmetic throughout, so the
  * result is order-independent and exactly equals the explode+groupBy
  * formulation the DuckDB oracle replays.
  */
object SimHashUtil {
  def simhash32(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](32)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        // single source of truth for the md5-derived 32-bit token hash
        val h = TextHashKernels.hash32(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 32) {
          votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var r = 0L
    var b = 0
    while (b < 32) { if (votes(b) > 0) r |= (1L << b); b += 1 }
    r
  }
}

/** Native per-document SimHash over an `array<string>` token column.
  *
  * The round-2 formulation exploded every token into its own row and
  * ran a 32-column hash aggregate — one full token shuffle per corpus
  * pass. This computes the signature in the scan projection (one call
  * per document, no explode, no shuffle): at 100 TB that removes the
  * single largest data movement of the SimHash dedup path.
  *
  * Codegen calls the static [[SimHashUtil]] kernel, so the expression
  * stays inside whole-stage codegen.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash32 expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash32"

  override def nullSafeEval(a: Any): Any =
    SimHashUtil.simhash32(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.SimHashUtil.simhash32($a)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column-level entry point — built programmatically, so it works in
    * ANY SparkSession (no function-registry registration required).
    */
  def cosineSim(a: Column, b: Column): Column =
    GraftShims.column(CosineSimilarity(
      GraftShims.expression(a), GraftShims.expression(b)))

  /** Native RHP bucket (see [[RhpBucket]]). */
  def rhpBucket(v: Column, dims: Int, planes: Int): Column =
    GraftShims.column(RhpBucket(GraftShims.expression(v), dims, planes))

  /** Native SimHash signature (see [[SimHash32]]). */
  def simHash32(tokens: Column): Column =
    GraftShims.column(SimHash32(GraftShims.expression(tokens)))
}
