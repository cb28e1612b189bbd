package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided testdata tables (TESTDATA.md).
  *
  * Reads are plain parquet scans so Catalyst's column pruning and
  * predicate pushdown reach the file source (verify with
  * `.explain("formatted")`: `PushedFilters` / `ReadSchema`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session invariant required by `events` (parquet TIMESTAMP(NANOS)):
    * call once at SparkSession construction. All graft entry points
    * (Bench, Verify, tests) do; external sessions must too — the
    * loader itself is read-only and does NOT set it.
    */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Repartition ONLY when the scan is under-parallel (the testdata
    * tables are single-row-group single files -> 1 input split, which
    * would pin downstream CPU work to one core). On real multi-file
    * inputs the partition count exceeds the core count and this is an
    * identity — no gratuitous full-table shuffle at scale.
    */
  def spread(df: DataFrame): DataFrame = {
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < math.max(2, parallelism / 2))
      df.repartition(parallelism)
    else df
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader
    * rejects. Read nanos as raw longs: `ts_ns` keeps the exact value,
    * and `ts` is the micros truncation as a TimestampType for
    * date/window functions. NOTE the ORACLE only ever sees micros
    * (DuckDB reads the NANOS parquet truncated), so any oracle-checked
    * ordering/arithmetic must use the truncated form (`ts` or
    * `ts_ns div 1000`) — raw-ns ordering would resolve same-microsecond
    * ties differently than the oracle's tiebreak (q18/q19/q54 all
    * truncate for exactly this). Epochs are positive, so `div 1000`
    * (floor) matches DuckDB's ns→us cast.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // defensive: runtime-settable and idempotent, so a driver invoking
    // SparkEntry.queries from its OWN session (never through
    // Sessions.build/configure) still reads the NANOS parquet
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts_ns", col("ts"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000L")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
