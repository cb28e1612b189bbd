package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Grouped top-k as a first-class operator: for each group, the k rows
  * with the largest (or smallest) value of an order expression.
  *
  * Spark expresses this as `row_number().over(Window...)` + filter,
  * which SORTS every group's full row set after a full shuffle. This
  * operator instead keeps a bounded k-row heap per group on the map
  * side, shuffles only the surviving <= k rows per (group, partition),
  * and merges heaps on the reduce side — the shuffle volume drops from
  * |rows| to |groups| * k * partitions, the difference between a sort
  * and a bounded selection at 100 TB.
  *
  * Full custom-operator stack: logical node -> planner Strategy ->
  * partial + final physical execs (EnsureRequirements inserts the
  * key shuffle between them), registered via GraftExtensions.
  *
  * Tie-breaking among equal order values is unspecified, like LIMIT.
  */
case class GroupedTopK(
    groupExprs: Seq[Expression],
    orderExpr: Expression,
    k: Int,
    largest: Boolean,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopK =
    copy(child = newChild)
}

object GroupedTopK {
  /** API entry: df.transform(GroupedTopK.perKey(...)) shape.
    * Self-registers the planner strategy on the calling session, so it
    * works in sessions that did not load GraftExtensions.
    */
  def perKey(df: DataFrame, groupCols: Seq[String], orderCol: String,
             k: Int, largest: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(GroupedTopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupedTopKStrategy
    val plan = GroupedTopK(
      groupCols.map(c => GraftShims.expression(df.col(c))),
      GraftShims.expression(df.col(orderCol)),
      k, largest, df.queryExecution.analyzed)
    GraftShims.ofRows(spark, plan)
  }
}

object GroupedTopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopK(g, o, k, largest, child) =>
      val partial = GroupedTopKExec(g, o, k, largest, isFinal = false, planLater(child))
      GroupedTopKExec(g, o, k, largest, isFinal = true, partial) :: Nil
    case _ => Nil
  }
}

/** Bounded per-group selection. Partial mode runs on whatever
  * partitioning the child has (map-side); final mode requires
  * clustering by the group keys, which EnsureRequirements satisfies
  * with one hash shuffle of the (already <= k per group per partition)
  * survivors.
  */
case class GroupedTopKExec(
    groupExprs: Seq[Expression],
    orderExpr: Expression,
    k: Int,
    largest: Boolean,
    isFinal: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (isFinal) ClusteredDistribution(groupExprs) :: Nil
    else UnspecifiedDistribution :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val group = groupExprs
    val order = orderExpr
    val keep = k
    val asc = !largest
    val childOutput = child.output
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(group, childOutput)
      val boundOrder = org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(order, org.apache.spark.sql.catalyst.expressions.AttributeSeq(childOutput))
      val ordering = TypeUtils.getInterpretedOrdering(order.dataType)
      // heap root = worst kept value; evict when a better row arrives
      val heapOrd = new Ordering[(Any, InternalRow)] {
        def compare(a: (Any, InternalRow), b: (Any, InternalRow)): Int = {
          val c = ordering.compare(a._1, b._1)
          if (asc) -c else c
        }
      }
      val byKey = scala.collection.mutable.HashMap
        .empty[org.apache.spark.sql.catalyst.expressions.UnsafeRow,
               scala.collection.mutable.PriorityQueue[(Any, InternalRow)]]
      it.foreach { row =>
        val key = keyProj(row)
        val heap = byKey.getOrElseUpdate(key.copy(),
          scala.collection.mutable.PriorityQueue.empty(heapOrd.reverse))
        val v = boundOrder.eval(row)
        // rows with a NULL order value are excluded (documented)
        if (v != null) {
          if (heap.size < keep) heap.enqueue((v, row.copy()))
          else if (heapOrd.compare((v, row), heap.head) > 0) {
            heap.dequeue(); heap.enqueue((v, row.copy()))
          }
        }
      }
      byKey.valuesIterator.flatMap(_.iterator.map(_._2))
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKExec =
    copy(child = newChild)
}
