package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: derive a `level` lower bound from hierarchy-code
  * prefix filters, unlocking partition pruning on the level-partitioned
  * warehouse (SURVEY §4: the Spark replacement for the reference's
  * B-tree code index, /root/reference/init_db.sql:14).
  *
  * A dotted kemendagri code has a fixed length per level (2/5/8/13), so
  * `kode LIKE 'p%'` can only match rows with level >= L(len(p)):
  * len <= 2 -> 1, <= 5 -> 2, <= 8 -> 3, else 4. The injected conjunct
  * `level >= L` is redundant semantically but prunes whole level
  * partitions (and parquet row groups) before the scan.
  *
  * Safety: only TOP-LEVEL conjuncts are considered — a StartsWith under
  * OR/NOT (e.g. the null-tolerant optional-prefix pattern) implies
  * nothing. Idempotence: skipped when the predicate already constrains
  * `level` (user-specified or previously injected).
  */
object PrefixLevelPruning extends Rule[LogicalPlan] with PredicateHelper {

  private val Key = "kode_wilayah_kemendagri"

  private def minLevel(prefixLen: Int): Int =
    if (prefixLen <= 2) 1 else if (prefixLen <= 5) 2 else if (prefixLen <= 8) 3 else 4

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child)
        if child.output.exists(a => a.name == "level") &&
          !cond.references.exists(_.name == "level") =>
      val mins = splitConjunctivePredicates(cond).collect {
        case StartsWith(a: Attribute, Literal(p: UTF8String, StringType))
            if a.name == Key => minLevel(p.toString.length)
      }
      if (mins.isEmpty || mins.max <= 1) f
      else {
        val levelAttr = child.output.find(_.name == "level").get
        Filter(And(cond, GreaterThanOrEqual(levelAttr, Literal(mins.max))), child)
      }
  }
}
