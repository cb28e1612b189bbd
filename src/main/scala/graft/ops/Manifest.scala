package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset-VERSION manifests: per-shard content checksums that make
  * "are these two copies of the corpus identical, and if not, which
  * shards changed?" a KB-sized comparison instead of a 100 TB join.
  *
  * The checksum must be ORDER-INDEPENDENT (shards rewrite in arbitrary
  * row order) and MERGEABLE (a shard's digest is a bounded aggregate a
  * writer computes while writing). Two independent combiners over the
  * per-row 60-bit content hash give that: XOR (catches any odd
  * multiset difference) and SUM mod 2^60 (catches the even-count
  * swaps XOR cancels — two identical rows added, a row moved between
  * duplicates). A multiset collision must defeat both simultaneously
  * under a 60-bit hash — ignorable at any shard size this targets.
  */
object Manifest {

  /** Per-shard manifest: `(shard, n, xor60, sum60)` — row count plus
    * the two order-independent combiners over the row content hash
    * (hash60 of the `cols` values joined on the U+0001 control
    * separator, so adjacent columns cannot smear into each other;
    * concat_ws SKIPS a NULL cell on both engines, so a NULL and an
    * empty string collide — callers hash non-nullable columns or
    * coalesce first). One
    * map-side-combined aggregate; digests travel, rows never do.
    */
  def shardManifest(df: DataFrame, shardCol: String,
                    cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "shardManifest needs at least one content column")
    val row = graft.Pipeline.wordHash60(
      concat_ws("\u0001", cols.map(c => col(c).cast("string")): _*))
    df.select(col(shardCol).as("shard"), row.as("_h"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).cast("long").as("n"),
        bit_xor(col("_h")).as("xor60"),
        expr("CAST(sum(CAST(_h AS DECIMAL(38,0))) % 1152921504606846976 AS BIGINT)")
          .as("sum60"))
  }

  /** Manifest DIFF between two dataset versions: per shard present in
    * either manifest, `status` in {added, removed, changed, equal} —
    * the shard-granular change map that tells an incremental consumer
    * (re-embedder, re-indexer, replicator) exactly which shards to
    * re-read. A full-outer join of two KB-scale frames; the corpora
    * themselves never meet.
    */
  def manifestDiff(a: DataFrame, b: DataFrame): DataFrame = {
    val left = a.select(col("shard"), col("n").as("_an"),
      col("xor60").as("_ax"), col("sum60").as("_as"))
    val right = b.select(col("shard"), col("n").as("_bn"),
      col("xor60").as("_bx"), col("sum60").as("_bs"))
    left.join(right, Seq("shard"), "full_outer")
      .withColumn("status",
        when(col("_bn").isNull, lit("removed"))
          .when(col("_an").isNull, lit("added"))
          .when(col("_an") === col("_bn") && col("_ax") === col("_bx") &&
            col("_as") === col("_bs"), lit("equal"))
          .otherwise(lit("changed")))
      .select(col("shard"), col("status"),
        coalesce(col("_an"), lit(0L)).as("n_old"),
        coalesce(col("_bn"), lit(0L)).as("n_new"))
  }
}
