package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff: classify every document across two corpus
  * versions as added / removed / changed / unchanged — the incremental-
  * update primitive behind "what moved between yesterday's crawl and
  * today's" (re-clean only the changed slice, re-pack only the touched
  * strata, audit unexpected churn).
  *
  * One full outer equi-join on the id (each side shuffles once on a
  * high-cardinality key) comparing a content HASH, not the content —
  * at 100 TB the join carries two 16-byte digests per row instead of
  * the documents themselves, and both scans prune to (id, content)
  * before hashing.
  */
object Diff {

  val Added = "added"
  val Removed = "removed"
  val Changed = "changed"
  val Unchanged = "unchanged"

  /** Per-id status frame: (`idCol`, `status`). Presence is carried by
    * an explicit per-side marker, NOT by hash nullness — `md5(NULL)` is
    * NULL, so a present row with NULL content would otherwise read as
    * absent and misclassify (NULL→'x' must be `changed`, NULL→NULL
    * `unchanged`); the hash compare itself is null-safe for the same
    * reason.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                   contentCol: String): DataFrame = {
    val o = oldDf.select(col(idCol), md5(col(contentCol)).as("_old_h"),
      lit(true).as("_old_p"))
    val n = newDf.select(col(idCol), md5(col(contentCol)).as("_new_h"),
      lit(true).as("_new_p"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_old_p").isNull, Added)
          .when(col("_new_p").isNull, Removed)
          .when(!(col("_old_h") <=> col("_new_h")), Changed)
          .otherwise(Unchanged).as("status"))
  }

  /** Bounded summary of [[snapshotDiff]] (4 rows — the churn report a
    * scheduler alerts on).
    */
  def snapshotDiffCounts(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                         contentCol: String): DataFrame =
    snapshotDiff(oldDf, newDf, idCol, contentCol)
      .groupBy("status").agg(count(lit(1)).as("n"))

  /** INCREMENTAL-INGEST dedup: the surviving rows of a new batch after
    * dropping (a) every row whose content already exists in the
    * warehouse corpus — by 16-byte digest, the documents themselves
    * never join — and (b) in-batch exact duplicates (lowest id per
    * content wins). The append-only corpus-growth gate: what is left
    * is safe to append without re-deduplicating the warehouse.
    *
    * Shape at scale: one distinct over the warehouse digests (with the
    * warehouse column-pruned to the content column before hashing),
    * one anti equi-join on the digest, one in-batch window keyed on the
    * digest. The warehouse side would be materialized once per ingest
    * cycle and reused across batches.
    */
  def dedupAgainst(newDocs: DataFrame, existing: DataFrame, idCol: String,
                   contentCol: String): DataFrame = {
    val seen = existing.select(md5(col(contentCol)).as("_seen_h")).distinct()
    val fresh = newDocs.join(seen,
      md5(newDocs(contentCol)) === seen("_seen_h"), "left_anti")
    graft.Dedup.exact(fresh, idCol, contentCol)
  }
}
