package graft

import org.apache.spark.sql.functions._

/** Scratch profiler for q217's stage costs (round-16 item 3). Not a
  * spec — run via `test:runMain graft.Q217Profile`.
  */
object Q217Profile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.fromEnv("q217-profile")
    val d = "/root/testdata/sf0.1"
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // warmup the scan
    Tables.lineitem(spark, d).count()
    (1 to 3).foreach { pass =>
      println(s"--- pass $pass ---")
      val v = Tables.lineitem(spark, d).select(
        expr("CAST(floor(l_extendedprice) AS BIGINT)").as("x"),
        expr("CAST(floor(l_quantity) AS BIGINT)").as("y"))
      val bxy = time("histQuantileBucketsN") {
        graft.ops.Layout.histQuantileBucketsN(v, Seq("x", "y"), 8)._1
      }
      val stats = time("zorder build+exec") {
        val s = graft.ops.Layout.zorderFileStatsN(
          bxy.select(col("x_qb").as("xb"), col("y_qb").as("yb")),
          Seq("xb", "yb"), bits = 3, rowsPerFile = 4096L)
          .orderBy("file_id")
        s.write.format("noop").mode("overwrite").save()
      }
      time("clearCache") { spark.catalog.clearCache() }
    }
    spark.stop()
  }
}
