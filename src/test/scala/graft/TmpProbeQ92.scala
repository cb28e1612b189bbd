package graft

import org.apache.spark.sql.functions._

// Temporary measurement probe — NOT committed.
object TmpProbeQ92 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("32", "probe-q92")
    val d = "/root/testdata/sf0.1"
    val sh = Dedup.shingleSets(Tables.spread(Tables.documents(spark, d)), "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sh.count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm
    Dedup.containmentPairs(sh, "doc_id", threshold = 0.7).write.format("noop").mode("overwrite").save()
    // full operator
    time("full")(Dedup.containmentPairs(sh, "doc_id", threshold = 0.7)
      .write.format("noop").mode("overwrite").save())
    // blocking only: replicate candidate stage
    val m = Pipeline.containmentProbesFor(0.7)
    def tagStruct(s: org.apache.spark.sql.Column) =
      struct(Pipeline.wordHash32(s).as("h"), s.as("s"))
    val probes = sh.select(col("doc_id").as("_pid"),
      explode(transform(
        slice(array_sort(transform(col("shingles"), tagStruct(_))), 1, m),
        x => x("h"))).as("_h"))
    val indexAll = sh
      .select(col("doc_id").as("_iid"), explode(col("shingles")).as("_s"))
      .select(col("_iid"), Pipeline.wordHash32(col("_s")).as("_h"))
    val cand = probes.join(indexAll,
        probes("_h") === indexAll("_h") && col("_pid") =!= col("_iid"))
      .select(least(col("_pid"), col("_iid")).as("a_id"),
        greatest(col("_pid"), col("_iid")).as("b_id"))
      .distinct()
    val nCand = time("blocking(distinct cand)")(cand.count())
    println(s"PROBE n_candidates: $nCand")
    val nDocs = sh.count()
    val nShingles = sh.select(sum(size(col("shingles")))).head().getLong(0)
    println(s"PROBE n_docs: $nDocs  total_shingles: $nShingles  probes_per_doc: $m")
    spark.stop()
  }
}
