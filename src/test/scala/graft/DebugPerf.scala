package graft

import org.apache.spark.sql.SparkSession

object DebugPerf {
  def main(args: Array[String]): Unit = {
    val mpb = sys.env.getOrElse("MPB", "128m")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("debug-mpb")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.files.maxPartitionBytes", mpb)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-sql-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    def run(name: String): Unit =
      Queries.byName(name).build(spark, sf).write.format("noop").mode("overwrite").save()
    val names = Seq("q01_pricing_summary", "q19_running_total", "q38_window_rank",
      "q48_grouped_topk", "q47_array_ops", "q63_array_hof", "q54_sessionization",
      "q11_star_join", "q49_correlated_subquery")
    names.foreach(run)
    val results = names.map { n =>
      val xs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); run(n); (System.nanoTime() - t0) / 1e9
      }.sorted
      n -> xs(1)
    }
    results.foreach { case (n, m) => println(f"$mpb $n: $m%.2f") }
    println(f"$mpb TOTAL: ${results.map(_._2).sum}%.2f")
    spark.stop()
  }
}
