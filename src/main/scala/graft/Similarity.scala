package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.plans.VectorExpressions.cosineSim

/** User-facing similarity-search API over an embedding corpus
  * (`idCol: long`, `vecCol: array<float|double>`).
  *
  * `topK` is the exact brute-force baseline: one scan, per-partition
  * top-k (TakeOrderedAndProject), native fused cosine kernel. `annTopK`
  * is the scale path: random-hyperplane LSH buckets shrink the probe
  * set ~2^planes-fold; at rest the bucket column doubles as a partition
  * key so probes become pruned scans.
  */
object Similarity {

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Exact top-k nearest neighbours of `queryId` by cosine. */
  def topK(df: DataFrame, idCol: String, vecCol: String,
           queryId: Long, k: Int = 10): DataFrame = {
    val q = df.filter(col(idCol) === queryId)
      .select(asDouble(col(vecCol)).as("_qv"))
    df.filter(col(idCol) =!= queryId)
      .select(col(idCol), asDouble(col(vecCol)).as("_v"))
      .crossJoin(broadcast(q))
      .select(col(idCol), cosineSim(col("_qv"), col("_v")).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Approximate top-k: probe only the query's RHP bucket. */
  def annTopK(df: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int = 10, dims: Int = 64,
              planes: Int = 4): DataFrame = {
    val withB = df
      .select(col(idCol), asDouble(col(vecCol)).as("_v"))
      .withColumn("_bucket", Pipeline.rhpBucket(col("_v"), dims, planes))
    val q = withB.filter(col(idCol) === queryId)
      .select(col("_bucket").as("_qb"), col("_v").as("_qv"))
    withB.filter(col(idCol) =!= queryId)
      .join(broadcast(q), col("_bucket") === col("_qb"))
      .select(col(idCol), cosineSim(col("_qv"), col("_v")).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Append text-analysis feature columns to a document DataFrame:
    * token counts, type-token ratio, stopword ratio, BPE-ish subword
    * estimate, canonical fingerprint, rolling hash — all scan-side
    * codegen'd expressions (no shuffle).
    */
  def withTextFeatures(df: DataFrame, textCol: String): DataFrame = {
    val w = Pipeline.words(col(textCol))
    df.withColumn("n_tokens", size(w))
      .withColumn("n_distinct_tokens", size(array_distinct(w)))
      .withColumn("ttr", col("n_distinct_tokens").cast("double") / col("n_tokens"))
      .withColumn("stopword_ratio",
        Pipeline.stopwordCount(w).cast("double") / col("n_tokens"))
      .withColumn("n_subword_est", Pipeline.subwordTokenCount(w))
      .withColumn("fingerprint", Pipeline.canonicalFingerprint(w))
      .withColumn("rolling_hash", Pipeline.rollingHash(w))
  }
}
