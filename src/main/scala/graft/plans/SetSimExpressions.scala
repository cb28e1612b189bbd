package graft.plans

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructType}

/** Native weighted set-intersection kernel for the verify stage of
  * [[graft.ops.SetSim.weightedPrefixFilterJoin]]: two token-SORTED
  * `array<struct<_tok: long, _w: long>>` columns merge-intersect in
  * one linear pass, summing the weights of common tokens.
  *
  * Why a custom expression: the built-in composition —
  * `aggregate(filter(a, x -> array_contains(tb, x._tok)), ...)` — is
  * O(|a| * |b|) per pair AND interpreted (higher-order functions don't
  * codegen; every element comparison boxes through lambda variables).
  * Measured on the q265 sf10 sweep it pinned 32 cores in
  * `SimpleHigherOrderFunction.eval` for minutes per pass; this merge
  * is O(|a| + |b|) with primitive `getLong` reads inside whole-stage
  * codegen — the same reasoning as [[CosineSimilarity]].
  *
  * Contract: both arrays sorted ascending by `_tok` (field 0), tokens
  * distinct within each array (`sort_array(collect_list(struct(...)))`
  * with unique tokens produces exactly this). Null array -> null
  * (BinaryExpression default); struct elements are never null.
  */
case class WeightedIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(st: StructType, _) =>
        st.length == 2 && st.fields.forall(_.dataType == LongType)
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"weighted_intersect expects two array<struct<long, long>>, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "weighted_intersect"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var acc = 0L
    while (i < nx && j < ny) {
      val tx = x.getStruct(i, 2).getLong(0)
      val ty = y.getStruct(j, 2).getLong(0)
      if (tx < ty) i += 1
      else if (tx > ty) j += 1
      else { acc += x.getStruct(i, 2).getLong(1); i += 1; j += 1 }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val tx = ctx.freshName("tx"); val ty = ctx.freshName("ty")
      val acc = ctx.freshName("acc")
      s"""
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $acc = 0L;
         |while ($i < $nx && $j < $ny) {
         |  final long $tx = $a.getStruct($i, 2).getLong(0);
         |  final long $ty = $b.getStruct($j, 2).getLong(0);
         |  if ($tx < $ty) { $i++; }
         |  else if ($tx > $ty) { $j++; }
         |  else { $acc += $a.getStruct($i, 2).getLong(1); $i++; $j++; }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WeightedIntersect =
    copy(left = newLeft, right = newRight)
}

object SetSimExpressions {
  def weightedIntersect(a: Column, b: Column): Column =
    GraftShims.column(WeightedIntersect(
      GraftShims.expression(a), GraftShims.expression(b)))
}
