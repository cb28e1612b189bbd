// scratch probe, run via Test/runMain not shipped
package graft
object Q90Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("32", "q49-probe")
    val dir = "/root/repo/target/sf1-bench"
    val q = Queries.byName("q90_semantic_dedup").build(spark, dir)
    q.write.format("noop").mode("overwrite").save()
    val t0 = System.nanoTime()
    q.write.format("noop").mode("overwrite").save()
    println(f"Q90 TIMED: ${(System.nanoTime()-t0)/1e9}%.2f s")
    println(q.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
