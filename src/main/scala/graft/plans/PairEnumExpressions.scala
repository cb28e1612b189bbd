package graft.plans

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Compiled unordered-pair enumeration over a sorted array — the
  * wedge kernel of the Adamic–Adar family (round-18 optimization).
  *
  * `sorted_pairs(arr)` = `array<struct<u, v>>` of every (arr[i],
  * arr[j]) with i < j — exactly what the previous nested
  * higher-order-function form
  * `flatten(transform(ns, (x,i) -> transform(slice(ns, i+2, ...),
  * y -> struct(x, y))))` computed, but in one tight JIT-compiled
  * loop instead of an interpreted lambda per element: the HOF form
  * paid a NamedLambdaVariable binding + closure eval per emitted
  * struct plus a flattened intermediate array-of-arrays, and the
  * round-18 spill audit showed q271 at sf0.1 is CPU-bound in exactly
  * this in-task generation (0.17 GB shuffle read, zero spill, ~4.4 s
  * wall). Enumeration order is identical (row-major i < j), so
  * downstream aggregation input is the same multiset in the same
  * order.
  *
  * Elements are assumed non-null (the callers build the array with
  * `sort_array(collect_list(...))`, which never emits nulls); struct
  * elements are copied once per INPUT element (not per pair) and
  * shared read-only across the emitted pair structs.
  */
object PairEnumUtil {
  def pairsLong(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var idx = 0
    var i = 0
    while (i < n) {
      val u: java.lang.Long = a.getLong(i)
      var j = i + 1
      while (j < n) {
        out(idx) = new GenericInternalRow(Array[Any](u, a.getLong(j)))
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def pairsGeneric(a: ArrayData, et: DataType): ArrayData = {
    val n = a.numElements()
    val elems = new Array[Any](n)
    var i = 0
    while (i < n) {
      elems(i) = a.get(i, et) match {
        case r: InternalRow => r.copy() // detach from the array buffer
        case other => other
      }
      i += 1
    }
    val out = new Array[Any](n * (n - 1) / 2)
    var idx = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(idx) = new GenericInternalRow(Array[Any](elems(i), elems(j)))
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class SortedPairs(child: Expression) extends UnaryExpression {

  private lazy val arrType: ArrayType = child.dataType.asInstanceOf[ArrayType]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sorted_pairs expects an array, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("u", arrType.elementType, arrType.containsNull),
    StructField("v", arrType.elementType, arrType.containsNull))),
    containsNull = false)

  override def prettyName: String = "sorted_pairs"

  override def nullSafeEval(v: Any): Any =
    if (arrType.elementType == LongType)
      PairEnumUtil.pairsLong(v.asInstanceOf[ArrayData])
    else
      PairEnumUtil.pairsGeneric(v.asInstanceOf[ArrayData], arrType.elementType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      if (arrType.elementType == LongType)
        s"${ev.value} = graft.plans.PairEnumUtil.pairsLong($a);"
      else {
        val et = ctx.addReferenceObj("et", arrType.elementType,
          "org.apache.spark.sql.types.DataType")
        s"${ev.value} = graft.plans.PairEnumUtil.pairsGeneric($a, $et);"
      }
    })

  override protected def withNewChildInternal(newChild: Expression): SortedPairs =
    copy(child = newChild)
}

object PairEnumExpressions {
  /** All i < j element pairs of a (sorted) array as struct(u, v). */
  def sortedPairs(c: Column): Column =
    GraftShims.column(SortedPairs(GraftShims.expression(c)))
}
