package graft

import org.apache.spark.sql.SparkSession

/** One place for session construction so every entry point (Bench,
  * Verify, Demo, Explain, tests) carries the same invariants:
  *
  * - UTC session timezone (oracle compare assumes it)
  * - parquet TIMESTAMP(NANOS) read as long (events table)
  * - GraftExtensions (cosine_sim SQL function + PrefixLevelPruning)
  * - shuffle partitions sized to the local core count, not the 200
  *   default (on a real cluster this is set per-job or left to AQE
  *   coalescing, which stays enabled either way)
  */
object Sessions {
  def build(cpus: String, appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-sql-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    LshObservability.register(spark)
    spark
  }

  def fromEnv(appName: String = "graft"): SparkSession =
    build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), appName)
}
