package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed end-to-end training-corpus cleaning pipeline — the
  * "switch your pipeline to this library" surface that chains the
  * individually-verified operators in their canonical order:
  *
  *   1. exact dedup (content bytes)            — cheapest first
  *   2. near dedup (MinHash-LSH + Jaccard)     — on the survivors only
  *   3. quality filter (length / stopword mix) — scan-side column math
  *   4. feature annotation (tokens, TTR, fingerprints, rolling hash)
  *
  * Every stage is a DataFrame -> DataFrame transform with the scale
  * shapes documented on the underlying operators (one derived-key
  * shuffle per dedup stage, no cartesians, no driver collects), so the
  * composition inherits them. Stage counts are computed ONCE via a
  * single pass per boundary (the `Report` is four counts — at 100 TB
  * these are the same four actions a production run would log).
  */
object CorpusPipeline {

  /** Per-stage surviving row counts. */
  case class Report(
      input: Long,
      afterExactDedup: Long,
      afterNearDedup: Long,
      afterQualityFilter: Long) {
    def json: String =
      s"""{"input":$input,"after_exact_dedup":$afterExactDedup,""" +
        s""""after_near_dedup":$afterNearDedup,"after_quality_filter":$afterQualityFilter}"""
  }

  /** Quality predicate: enough tokens, not stopword-saturated. The
    * thresholds mirror the oracle-checked q33 classification bounds.
    */
  def qualityFilter(textCol: String, minTokens: Int, maxStopRatio: Double) = {
    val w = Pipeline.words(col(textCol))
    size(w) >= minTokens &&
      (Pipeline.stopwordCount(w).cast("double") / size(w)) <= maxStopRatio
  }

  /** Result of [[clean]]: the cleaned, feature-annotated corpus, the
    * per-stage report, and `release()` — call it once the corpus is
    * materialized (written/collected) to drop the one cache entry
    * clean() leaves behind (the near-dedup boundary rooting `corpus`).
    */
  final case class Cleaned(corpus: DataFrame, report: Report,
                           release: () => Unit)

  private val Disk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

  /** The shared stage chain: persisted exact/sig/near boundaries (each
    * roots downstream stages AND a report count — unpersisted, the md5
    * window and the LSH chain would re-derive per action) plus the
    * quality-filtered, feature-annotated corpus. Callers own the
    * persisted frames' release.
    */
  private final case class Stages(exact: DataFrame, sig: DataFrame,
                                  near: DataFrame, quality: DataFrame,
                                  annotated: DataFrame)

  /** The four per-stage counts both facades report — one action per
    * persisted boundary, shared so the facades cannot diverge.
    */
  private def countReport(docs: DataFrame, st: Stages): Report =
    Report(docs.count(), st.exact.count(), st.near.count(), st.quality.count())

  private def runClean(docs: DataFrame, idCol: String, textCol: String,
                       jaccardThreshold: Double, minTokens: Int,
                       maxStopRatio: Double): Stages = {
    val exact = Dedup.exact(docs, idCol, textCol).persist(Disk)
    val sig = Dedup.shingleSignatures(exact, idCol, textCol).persist(Disk)
    val near = Dedup.nearSigned(exact, sig, idCol, threshold = jaccardThreshold)
      .persist(Disk)
    val quality = near.filter(qualityFilter(textCol, minTokens, maxStopRatio))
    Stages(exact, sig, near, quality,
      Similarity.withTextFeatures(quality, textCol))
  }

  /** Run the full chain. The upstream caches (sig, exact) are released
    * before returning — the counts materialized `near`'s cache, which
    * alone roots everything downstream — while `near` stays cached so
    * the caller's materialization of the returned corpus does NOT
    * re-pay the dedup chain; drop it via `release()` when done. (A
    * blanket clearCache() would drop unrelated caches a caller holds.)
    */
  def clean(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      jaccardThreshold: Double = 0.8,
      minTokens: Int = 15,
      maxStopRatio: Double = 0.5): Cleaned = {
    val st = runClean(docs, idCol, textCol, jaccardThreshold, minTokens, maxStopRatio)
    val report = countReport(docs, st)
    st.sig.unpersist()
    st.exact.unpersist()
    Cleaned(st.annotated, report, () => { st.near.unpersist(); () })
  }

  /** Per-stage counts for the FULL preparation chain. */
  final case class PrepareReport(
      clean: Report,
      afterDecontamination: Long,
      afterSampling: Long) {
    def json: String =
      s"""{"clean":${clean.json},"after_decontamination":$afterDecontamination,""" +
        s""""after_sampling":$afterSampling}"""
  }

  /** Result of [[prepare]]. */
  final case class Prepared(corpus: DataFrame, report: PrepareReport,
                            release: () => Unit)

  /** FULL training-data preparation: the [[clean]] chain (dedup +
    * quality + feature annotation), test-set decontamination,
    * stratified mixing, and token-budget sequence packing. The returned
    * corpus carries the feature columns plus `bin` — the training-batch
    * assignment — and each stage is the individually-oracle-verified
    * operator, so the composition inherits the scale shapes (no
    * cartesians, no driver collects, one shuffle per dedup/window
    * stage, scan-side sampling).
    *
    * The signature pass over the train side runs ONCE: the clean
    * chain's signature frame (over the exact-dedup survivors, a
    * superset of the cleaned corpus — valid per the
    * [[Dedup.shingleSignatures]] contract) is handed straight to the
    * decontamination blocking instead of being re-derived.
    */
  def prepare(
      docs: DataFrame,
      testCorpus: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      strataCol: String = "source",
      jaccardThreshold: Double = 0.8,
      decontThreshold: Double = 0.8,
      ratesPermille: Map[String, Int] = Map.empty,
      defaultPermille: Int = 1000,
      tokenBudget: Long = 2048L,
      minTokens: Int = 15,
      maxStopRatio: Double = 0.5): Prepared = {
    val st = runClean(docs, idCol, textCol, jaccardThreshold, minTokens, maxStopRatio)
    val cleanReport = countReport(docs, st)
    st.exact.unpersist() // sig + near stay: decontamination reuses both
    val testSig = Dedup.shingleSignatures(testCorpus, idCol, textCol).persist(Disk)
    // safe is persisted so the decontamination join (the most expensive
    // stage) executes ONCE: its count materializes the cache, and
    // mixed's cache builds from it
    val safe = Dedup.decontaminateSigned(st.annotated, st.sig, testSig,
      idCol, threshold = decontThreshold).persist(Disk)
    val mixed = ops.Sampling.stratified(safe, idCol, strataCol,
      ratesPermille, defaultPermille).persist(Disk)
    // n_subword_est comes from the feature-annotation stage — the same
    // token estimate the oracle-checked q69 packs on
    val packed = ops.Sampling.packSequences(mixed, idCol, strataCol,
      "n_subword_est", tokenBudget)
    val report = PrepareReport(cleanReport, safe.count(), mixed.count())
    // mixed's cache now roots the returned corpus; everything upstream
    // (sig — the largest frame in the job — near, testSig, safe) is
    // dead weight and released HERE, mirroring clean()'s discipline.
    // release() drops the one remaining entry.
    safe.unpersist()
    st.sig.unpersist()
    st.near.unpersist()
    testSig.unpersist()
    Prepared(packed, report, () => { mixed.unpersist(); () })
  }
}

/** Runnable demo of the composed pipeline (mirror of `wilayah.Demo`):
  * `sbt "runMain graft.PipelineDemo [sfDir]"` — cleans the documents
  * corpus and prints one JSON report line.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = Sessions.fromEnv("graft-pipeline-demo")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val result = CorpusPipeline.clean(Tables.documents(spark, sf))
    val nFeatures = result.corpus.columns.length
    println(s"""{"corpus":"$sf","report":${result.report.json},"feature_columns":$nFeatures}""")
    result.release()
    spark.stop()
  }
}
