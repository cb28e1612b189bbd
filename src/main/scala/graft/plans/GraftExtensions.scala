package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Session extension bundle: register with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  *
  * - the native kernels as SQL functions — `cosine_sim(a, b)`,
  *   `rhp_bucket(v, dims, planes)`, `simhash32(tokens)`,
  *   `word_shingles(tokens, n)`, `md5_hash32_array(tokens)`,
  *   `minhash_sig(shingles, k)`, `rolling_hash(tokens)` — so
  *   `spark.sql(...)` users get the same fused codegen paths as the
  *   Column API (which needs no registration and works without this).
  * - PrefixLevelPruning optimizer rule (kode-prefix -> level partition
  *   pruning on the wilayah warehouse).
  * - the GroupedTopK planner strategy.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Static-argument extraction: kernel shape parameters (dims, k, ...)
    * are literal ints baked into the generated code, never per-row
    * expressions.
    */
  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an integer literal, got $other")
  }

  private def register(ext: SparkSessionExtensions, name: String, clazz: Class[_])(
      build: Seq[Expression] => Expression): Unit =
    ext.injectFunction((
      new FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), build))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => PrefixLevelPruning)
    ext.injectPlannerStrategy(_ => GroupedTopKStrategy)
    register(ext, "cosine_sim", classOf[CosineSimilarity])(e =>
      CosineSimilarity(e(0), e(1)))
    register(ext, "rhp_bucket", classOf[RhpBucket])(e =>
      RhpBucket(e(0), intArg(e(1), "rhp_bucket", 2), intArg(e(2), "rhp_bucket", 3)))
    register(ext, "simhash32", classOf[SimHash32])(e => SimHash32(e(0)))
    register(ext, "word_shingles", classOf[WordShingles])(e =>
      WordShingles(e(0), intArg(e(1), "word_shingles", 2)))
    register(ext, "md5_hash32_array", classOf[Md5Hash32Array])(e => Md5Hash32Array(e(0)))
    register(ext, "minhash_sig", classOf[MinhashSignature])(e =>
      MinhashSignature(e(0), intArg(e(1), "minhash_sig", 2)))
    register(ext, "rolling_hash", classOf[RollingHash])(e => RollingHash(e(0)))
  }
}
