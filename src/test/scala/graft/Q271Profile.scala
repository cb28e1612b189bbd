package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scratch profiler for q271/q304's stage costs at sf1 (round-17
  * item: where do the ~90 s go — wedge generation, the (u, v)
  * exchange, or the aggregate?). Not a spec — run via
  * `Test/runMain graft.Q271Profile [sfDir]`.
  */
object Q271Profile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.fromEnv("q271-profile")
    val d = args.headOption.getOrElse("/root/repo/target/sf1-bench")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    Tables.lineitem(spark, d).count()
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val edges = Tables.lineitem(spark, d).select(
        col("l_orderkey").as("u"),
        (col("l_partkey") + lit(1000000000000L)).as("v"))
      val und = edges
        .select(least(col("u"), col("v")).as("a"),
          greatest(col("u"), col("v")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
      val full = args.length < 2
      val sym = und.select(col("a").as("w"), col("b").as("n"))
        .unionAll(und.select(col("b").as("w"), col("a").as("n")))
      val deg = sym.groupBy("w").agg(count(lit(1)).cast(LongType).as("deg"))
      val mids = sym.join(
          deg.filter(col("deg") >= 2 && col("deg") <= 64), Seq("w"))
        .withColumn("_c",
          floor(lit(1000000.0d) / log(col("deg").cast("double")))
          .cast(LongType))
      val nbrs = mids.groupBy("w", "_c")
        .agg(sort_array(collect_list(col("n"))).as("_ns"))
      if (full) {
        time("und distinct count") { println("  und = " + und.count()) }
        time("nbrs build (count)") { println("  nbrs = " + nbrs.count()) }
      }
      val wedges = nbrs.select(col("_c"), explode(expr(
        """flatten(transform(_ns, (x, i) ->
             transform(slice(_ns, i + 2, size(_ns) - i - 1),
               y -> struct(x AS u, y AS v))))""")).as("_p"))
        .select(col("_p.u").as("u"), col("_p.v").as("v"), col("_c"))
      if (full) {
        time("wedge gen (count only)") { println("  wedges = " + wedges.count()) }
        val scored = wedges.groupBy("u", "v").agg(
          sum("_c").as("aa_micro"),
          count(lit(1)).cast(LongType).as("common_neighbors"))
        time("wedge agg (count)") { println("  pairs = " + scored.count()) }
      }
      // hypothesis: the agg cost is the 3-long exchange + 2-col key; a
      // single packed long key halves the bytes and uses the long-key
      // agg path. Graph-specific packing for the experiment only:
      // endpoints on one side of the bipartite graph share the side
      // flag; ids mod 1e12 fit 30 bits on this replica set.
      val packed = wedges
        .select(expr(
          """IF(u >= 1000000000000L, shiftleft(1L, 62), 0L)
             + (u % 1000000000000L) * 2147483648L
             + (v % 1000000000000L)""").as("p"), col("_c"))
        .groupBy("p").agg(sum("_c").as("s"),
          count(lit(1)).cast(LongType).as("n"))
      time("packed-key agg (count)") { println("  packed = " + packed.count()) }
      val gatedPacked = packed.filter(col("n") >= 2)
      time("packed gated (count)") { println("  gated = " + gatedPacked.count()) }
      // hypothesis 2: the agg map spills under the 8g default heap
      // (32 tasks x 3.2M-entry maps); a wider agg exchange shrinks
      // per-task maps below the spill threshold
      val wide = wedges.repartition(256, col("u"), col("v"))
        .groupBy("u", "v").agg(sum("_c").as("s"),
          count(lit(1)).cast(LongType).as("n"))
      time("wide-256 agg (count)") { println("  wide = " + wide.count()) }
      if (full) {
        val fin = wedges.groupBy("u", "v").agg(
            sum("_c").as("aa_micro"),
            count(lit(1)).cast(LongType).as("common_neighbors"))
          .join(und.select(col("a").as("u"), col("b").as("v")),
            Seq("u", "v"), "left_anti")
          .orderBy(col("aa_micro").desc, col("u"), col("v"))
          .limit(100)
        time("anti + topk") { fin.write.format("noop").mode("overwrite").save() }
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
