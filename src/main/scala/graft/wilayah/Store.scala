package graft.wilayah

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse + keyed upsert (MERGE) over Parquet — the Spark
  * re-expression of the reference's row-at-a-time
  * `INSERT ... ON CONFLICT (kode) DO UPDATE`
  * (/root/reference/server.js:90-98, /root/reference/init_db.sql:21-36):
  * one set-oriented job instead of one DB round-trip per feature.
  *
  * Layout: Parquet partitioned by `level` (4 partitions), rows sorted
  * by kode within files. At 100 TB the same recipe holds: level is the
  * partition column, the merge shuffles once on the key, and prefix
  * queries prune partitions + parquet row groups (min/max on kode).
  */
object Store {

  val Key = "kode_wilayah_kemendagri"

  private val columns = Seq(
    "kode_wilayah_kemendagri", "nama_wilayah_kemendagri",
    "level", "geometry", "created_at", "updated_at")

  def load(spark: SparkSession, warehousePath: String): Option[DataFrame] =
    if (new java.io.File(warehousePath).exists())
      Some(spark.read.parquet(warehousePath))
    else None

  /** Last-writer-wins merge: for each key keep the newest row by
    * `updated_at` (ties: incoming wins), preserving the oldest
    * `created_at` — the ON CONFLICT DO UPDATE semantics of
    * /root/reference/init_db.sql:28-35 (created_at untouched,
    * updated_at refreshed). One shuffle on the key; partial-agg-free
    * window since the key is unique post-merge.
    */
  def merge(existing: Option[DataFrame], incoming: DataFrame): DataFrame = {
    val in = incoming.select(columns.map(col): _*).withColumn("prio", lit(1))
    val all = existing match {
      case Some(e) => e.select(columns.map(col): _*).withColumn("prio", lit(0))
        .unionByName(in)
      case None => in
    }
    val byKey = Window.partitionBy(Key)
    all
      .withColumn("rn", row_number().over(
        byKey.orderBy(col("updated_at").desc, col("prio").desc)))
      .withColumn("created_at", min("created_at").over(byKey))
      .filter(col("rn") === 1)
      .drop("rn", "prio")
  }

  /** Rewrite the warehouse with the merged state. Writes to a temp
    * location first (the merge reads the live files, and Spark cannot
    * overwrite its own input in-flight), then swaps atomically-enough
    * for a single-writer batch ETL.
    *
    * The shuffle is `repartitionByRange(level, kode)`, NOT
    * `repartition(level)`: hash-on-level caps write parallelism at
    * the number of DISTINCT LEVELS (4) — measured at 50x geometry
    * volume the whole rewrite serialized behind one fat level-4 task
    * (96 s for a 48 MB warehouse; PLANS.md round 9). Range
    * partitioning keeps every task a contiguous (level, kode) slice —
    * `partitionBy` still routes rows to their level directory, files
    * within a directory hold disjoint sorted kode ranges, so parquet
    * min/max row-group pruning on kode prefixes is exactly as sharp —
    * while the write fans out across the cluster. At 100 TB this is
    * the difference between 4 writers and all of them.
    */
  def write(df: DataFrame, warehousePath: String): Unit = {
    val spark = df.sparkSession
    val tmp = warehousePath + ".tmp"
    df.repartitionByRange(col("level"), col(Key))
      .sortWithinPartitions("level", Key)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("level")
      .parquet(tmp)
    val dst = new java.io.File(warehousePath)
    if (dst.exists()) {
      val old = new java.io.File(warehousePath + ".old")
      deleteRec(old)
      rename(dst, old)
      rename(new java.io.File(tmp), dst)
      deleteRec(old)
    } else {
      rename(new java.io.File(tmp), dst)
    }
    // new files on disk — invalidate cached plans/file listings over
    // THIS path only. clearCache() (rounds <= 8) nuked every cache in
    // the session: in a long-lived cluster session that silently
    // un-persists unrelated frames (measured: a 50x replicate-and-sync
    // harness re-ran the JTS kernel once per branch, 98 s for a 7 s
    // write — PLANS.md round 9).
    spark.catalog.refreshByPath(warehousePath)
  }

  /** renameTo reports failure by RETURN VALUE — ignoring it would let a
    * failed swap masquerade as a successful sync while readers keep
    * serving the pre-merge warehouse.
    */
  private def rename(from: java.io.File, to: java.io.File): Unit =
    if (!from.renameTo(to))
      throw new java.io.IOException(s"warehouse swap failed: $from -> $to")

  /** Partition-scoped merge + write: only the level partitions present
    * in the incoming batch are merged and rewritten; untouched level
    * directories keep their existing files. Sound because a key's
    * level is a function of its code structure — a row can never
    * migrate between level partitions. At real scale (finer partition
    * keys) this is the difference between rewriting the warehouse and
    * rewriting a few directories per sync.
    */
  def mergeWritePartitions(
      spark: SparkSession, incoming: DataFrame, warehousePath: String): Unit = {
    import org.apache.spark.sql.functions.col
    val affected = incoming.select("level").distinct()
      .collect().map(_.getInt(0)).sorted
    val existingAffected = load(spark, warehousePath)
      .map(_.filter(col("level").isin(affected.map(Integer.valueOf): _*)))
    val merged = merge(existingAffected, incoming)

    val tmp = new java.io.File(warehousePath + ".ptmp")
    deleteRec(tmp)
    // range-partitioned for the same reason as [[write]]: the rewrite
    // of a touched level must fan out, not serialize on one task
    merged.repartitionByRange(col("level"), col(Key))
      .sortWithinPartitions("level", Key)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("level")
      .parquet(tmp.getPath)
    val whDir = new java.io.File(warehousePath)
    whDir.mkdirs()
    affected.foreach { l =>
      val fresh = new java.io.File(tmp, s"level=$l")
      val dst = new java.io.File(whDir, s"level=$l")
      if (fresh.exists()) {
        deleteRec(dst)
        rename(fresh, dst)
      }
    }
    deleteRec(tmp)
    // path-scoped invalidation, same rationale as [[write]]
    spark.catalog.refreshByPath(warehousePath)
  }

  /** Key-uniqueness check (the PK constraint Spark must emulate —
    * /root/reference/init_db.sql:6). Returns duplicate count, 0 = ok.
    */
  def duplicateKeys(df: DataFrame): Long =
    df.groupBy(Key).count().filter(col("count") > 1).count()

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete()
  }
}
