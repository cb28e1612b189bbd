package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSeq, BindReferences, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
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
  * and selects final winners on the reduce side — the shuffle volume
  * drops from |rows| to |groups| * k * partitions, the difference
  * between a sort and a bounded selection at 100 TB.
  *
  * Memory safety (both sides spill-proof):
  *
  * - The PARTIAL side bounds its group->heap map at
  *   `graft.topk.maxPartialGroups` (default 65536) entries. Once full,
  *   rows of unseen groups pass through untrimmed — partial trimming is
  *   a pure optimization, so overflow costs shuffle volume (degrading
  *   toward the window plan's traffic) but never correctness and never
  *   unbounded memory.
  * - The FINAL side declares a required child ordering of
  *   (group keys, order value), so EnsureRequirements plans Spark's
  *   own SortExec — which spills to disk under memory pressure — and
  *   the final pass is a streaming scan emitting the first k rows per
  *   key group with O(1) state. No per-group heap map on the reduce
  *   side at all.
  *
  * Full custom-operator stack: logical node -> planner Strategy ->
  * partial + final physical execs (EnsureRequirements inserts the
  * key shuffle and the spillable sort), registered via GraftExtensions.
  *
  * Tie-breaking among equal order values is unspecified, like LIMIT.
  * Rows with a NULL order value are excluded (documented).
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
  /** Conf key bounding the partial-side group map (entries). */
  val MaxPartialGroupsKey = "graft.topk.maxPartialGroups"
  val MaxPartialGroupsDefault = 65536

  /** API entry: df.transform(GroupedTopK.perKey(...)) shape.
    * Self-registers the planner strategy on the calling session (under
    * a lock — Verify builds queries from a thread pool), so it works in
    * sessions that did not load GraftExtensions.
    */
  def perKey(df: DataFrame, groupCols: Seq[String], orderCol: String,
             k: Int, largest: Boolean = true): DataFrame = {
    // fail at the API boundary: k = 0 would otherwise surface as an
    // opaque empty-heap exception deep inside a task
    require(k > 0, s"grouped top-k needs k > 0, got $k")
    val spark = df.sparkSession
    GroupedTopK.synchronized {
      if (!spark.experimental.extraStrategies.contains(GroupedTopKStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ GroupedTopKStrategy
    }
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
  * clustering + ordering by the group keys, which EnsureRequirements
  * satisfies with one hash shuffle of the (already <= k per group per
  * partition, modulo overflow pass-through) survivors followed by a
  * spill-capable sort.
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

  /** Final mode streams over rows sorted by (keys, order value): keys
    * ascending groups the rows; the order value descending (for
    * largest) puts each group's winners first.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (isFinal)
      (groupExprs.map(SortOrder(_, Ascending)) :+
        SortOrder(orderExpr, if (largest) Descending else Ascending)) :: Nil
    else Nil :: Nil

  /** Partial mode flushes its heaps in hash-map order, DESTROYING any
    * child ordering — it must not advertise one, or EnsureRequirements
    * would elide the final-mode sort when the child happens to already
    * satisfy it (e.g. a pre-sorted input) and the final streaming scan
    * would select the wrong rows.
    */
  override def outputOrdering: Seq[SortOrder] =
    if (isFinal) requiredChildOrdering.head else Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val order = orderExpr
    val keep = k
    val childOutput = child.output
    // group-key expressions for equality checks (partial map keys,
    // final boundary detection), bound on the driver so the task
    // closures capture plain expressions, not this plan node.
    // Float/double keys are NORMALIZED (-0.0 -> 0.0, canonical NaN):
    // the sort and the hash partitioning both treat those encodings as
    // equal, so byte-level key comparison must too — otherwise
    // interleaved -0.0/0.0 runs would reset the final scan's counter
    // and emit more than k rows for the logical group. (Spark's
    // NormalizeFloatingNumbers rule does this for Aggregate/Window/
    // Join keys; a custom node must do it for itself.)
    val boundKeys: Seq[Expression] = groupExprs.map(e =>
      GraftShims.normalizeFloats(
        BindReferences.bindReference(e, AttributeSeq(childOutput))))
    if (isFinal) {
      // streaming pass over (key, value)-sorted input: first k per key
      child.execute().mapPartitions { it =>
        val keyProj = UnsafeProjection.create(boundKeys)
        val boundOrder = BindReferences.bindReference(order, AttributeSeq(childOutput))
        var curKey: UnsafeRow = null
        var emitted = 0
        it.filter { row =>
          if (boundOrder.eval(row) == null) false
          else {
            val key = keyProj(row)
            if (curKey == null || key != curKey) {
              curKey = key.copy()
              emitted = 0
            }
            emitted += 1
            emitted <= keep
          }
        }
      }
    } else {
      val asc = !largest
      val maxGroups = conf.getConfString(
        GroupedTopK.MaxPartialGroupsKey,
        GroupedTopK.MaxPartialGroupsDefault.toString).toInt
      child.execute().mapPartitions { it =>
        val keyProj = UnsafeProjection.create(boundKeys)
        val boundOrder = BindReferences.bindReference(order, AttributeSeq(childOutput))
        val ordering = TypeUtils.getInterpretedOrdering(order.dataType)
        // heap root = worst kept value; evict when a better row arrives
        val heapOrd = new Ordering[(Any, InternalRow)] {
          def compare(a: (Any, InternalRow), b: (Any, InternalRow)): Int = {
            val c = ordering.compare(a._1, b._1)
            if (asc) -c else c
          }
        }
        val byKey = scala.collection.mutable.HashMap
          .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[(Any, InternalRow)]]
        // rows of groups beyond the map bound pass through untrimmed —
        // the final side re-selects exactly, so this only costs shuffle
        // volume, never correctness
        val passedThrough = it.filter { row =>
          val v = boundOrder.eval(row)
          if (v == null) false // NULL order value: excluded everywhere
          else {
            val key = keyProj(row)
            val known = byKey.contains(key)
            if (!known && byKey.size >= maxGroups) true
            else {
              val heap =
                if (known) byKey(key)
                else byKey.getOrElseUpdate(key.copy(),
                  scala.collection.mutable.PriorityQueue.empty(heapOrd.reverse))
              // the STORED order value is re-evaluated against the
              // COPIED row: for buffer-backed types (strings, decimals)
              // eval returns a view into the row's bytes, and a value
              // taken from the reused input row would mutate under the
              // heap when the iterator overwrites its buffer
              if (heap.size < keep) {
                val r = row.copy(); heap.enqueue((boundOrder.eval(r), r))
              } else if (heapOrd.compare((v, row), heap.head) > 0) {
                heap.dequeue()
                val r = row.copy(); heap.enqueue((boundOrder.eval(r), r))
              }
              false
            }
          }
        }
        // ++ evaluates its operand lazily: heaps flush only after the
        // input (and thus every absorption) is exhausted
        passedThrough ++ byKey.valuesIterator.flatMap(_.iterator.map(_._2))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKExec =
    copy(child = newChild)
}
