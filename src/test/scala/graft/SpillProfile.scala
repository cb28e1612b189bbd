package graft

/** Spill/shuffle audit for a single declared query (round-18 verdict
  * item 6: q265/q283 needed a measured spill profile before any
  * sf100-class claim). Runs the query solo with a task-metrics
  * listener and prints, per pass: wall seconds, total memory/disk
  * spill, shuffle bytes written/read, and the peak single-task
  * execution memory — the number to hold against
  * (executor heap x fractions) / concurrent tasks when judging
  * whether an agg/sort is spill-bound. Not a spec — run via
  * `Test/runMain graft.SpillProfile <query_name> [sfDir]`.
  */
object SpillProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SpillProfile <query_name> [sfDir]")
    val name = args(0)
    val d = if (args.length > 1) args(1) else "/root/repo/target/sf1-bench"
    val spark = Sessions.fromEnv("spill-profile")
    val mem = new java.util.concurrent.atomic.AtomicLong
    val disk = new java.util.concurrent.atomic.AtomicLong
    val shufW = new java.util.concurrent.atomic.AtomicLong
    val shufR = new java.util.concurrent.atomic.AtomicLong
    val peak = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            mem.addAndGet(m.memoryBytesSpilled)
            disk.addAndGet(m.diskBytesSpilled)
            shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            peak.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
          }
        }
      })
    val q = Queries.all.find(_.name == name)
      .getOrElse(sys.error(s"unknown query $name"))
    try Tables.names.foreach(n => Tables.load(spark, d, n).count())
    catch { case scala.util.control.NonFatal(_) => () }
    (1 to 3).foreach { pass =>
      Seq(mem, disk, shufW, shufR, peak).foreach(_.set(0L))
      val t0 = System.nanoTime()
      q.build(spark, d).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener bus drain
      println(f"SPILL $name pass=$pass sec=$sec%.2f " +
        f"spill_mem_gb=${mem.get / 1e9}%.2f " +
        f"spill_disk_gb=${disk.get / 1e9}%.2f " +
        f"shuffle_w_gb=${shufW.get / 1e9}%.2f " +
        f"shuffle_r_gb=${shufR.get / 1e9}%.2f " +
        f"peak_task_mem_mb=${peak.get / 1e6}%.1f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
