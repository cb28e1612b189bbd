package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extension bundle: register with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  *
  * - `cosine_sim(array<double>, array<double>)` SQL function (the
  *   programmatic Column API, VectorExpressions.cosineSim, needs no
  *   registration and works without this).
  * - PrefixLevelPruning optimizer rule (kode-prefix -> level partition
  *   pruning on the wilayah warehouse).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => PrefixLevelPruning)
    ext.injectPlannerStrategy(_ => GroupedTopKStrategy)
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(exprs(0), exprs(1))))
  }
}
