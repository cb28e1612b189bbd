package graft
/** Benchmark main (driver contract): runs every declared query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Queries run in sorted-name order after a warmup action, so timings
  * reflect steady-state execution, not JVM classloading / first-codegen
  * cost (which was ~4s on whichever query happened to run first).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.fromEnv("graft-bench")

    // Warmup: one full untimed pass. First execution of each plan pays
    // whole-stage-codegen compilation + JIT (measured: 8s cold vs 1.7s
    // warm on the nested higher-order minhash expressions); steady-state
    // timings are what a long-lived cluster session sees.
    // noop sink: forces FULL computation of every output column.
    // A count() action lets Catalyst prune the measured projections
    // away entirely (a scalar-functions query would time only its
    // scan), so count-based timings flatter projection-heavy queries.
    // NonFatal only: a fatal error (OOM, codegen StackOverflow) means
    // the JVM is dying — letting it propagate kills the run instead of
    // limping through remaining passes with near-zero garbage timings
    def run(q: QueryDef): Boolean =
      try { q.build(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
      catch { case scala.util.control.NonFatal(_) => false }

    // Plan-shape classification (round-16 verdict item 1): a query is
    // SHUFFLE-shaped iff its work crosses a shuffle exchange. The
    // weather instruments below keep one probe per shape, and every
    // pressure/adjustment decision for a query reads the probe of ITS
    // shape — round 16 burned its adjudication budget proving that 8
    // "regressions" on shuffle-heavy queries were box weather the
    // scan-shaped probe could not see. Two signals, OR'd:
    //  - the FINAL plan carries a shuffle exchange. Matched
    //    specifically (round-17 advice): a bare contains("Exchange")
    //    also matched BroadcastExchange, so a broadcast-join-only
    //    query with no shuffle was judged against the shuffle probe.
    //  - the BUILD ran a multi-stage job (round-17 verdict item 2):
    //    operators that eagerly collect a bounded panel at build time
    //    (spearmanCorr's six sums, compaction planners) return a
    //    final plan with no Exchange at all — their genuinely
    //    shuffle-shaped work happens in build-time jobs, which the
    //    listener below sees as submitted DAGs with > 1 stage.
    // Classification reads the warmup run's DataFrame (rebuilding
    // just to classify would pay the eager jobs twice); build
    // failures classify as shuffle-shaped, the conservative default.
    val shuffleExchangeRe = java.util.regex.Pattern.compile(
      "Exchange (hashpartitioning|rangepartitioning|SinglePartition|" +
        "RoundRobinPartitioning)")
    val jobsSeen = new java.util.concurrent.atomic.AtomicLong
    val shuffleJobsSeen = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobsSeen.incrementAndGet()
          if (js.stageInfos.size > 1) shuffleJobsSeen.incrementAndGet()
        }
      })
    // Listener delivery is async; every build-time job COMPLETED
    // before build returned, so its events are already queued — wait
    // for the counters to hold still for one tick (nothing else
    // submits jobs between builds), capped so a wedged bus cannot
    // stall the run. Cost: ~10 ms per scan-shaped query.
    def shuffleJobsSettled(): Long = {
      val deadline = System.nanoTime() + 200000000L
      var prev = (jobsSeen.get(), shuffleJobsSeen.get())
      var stable = false
      while (!stable && System.nanoTime() < deadline) {
        Thread.sleep(10)
        val cur = (jobsSeen.get(), shuffleJobsSeen.get())
        stable = cur == prev
        prev = cur
      }
      prev._2
    }
    def warmupAndClassify(q: QueryDef): Boolean =
      try {
        val before = shuffleJobsSettled()
        val df = q.build(spark, sfDir)
        val builtShuffled = shuffleJobsSettled() > before
        val planShuffled =
          try shuffleExchangeRe
            .matcher(df.queryExecution.executedPlan.toString).find()
          catch { case scala.util.control.NonFatal(_) => true }
        df.write.format("noop").mode("overwrite").save()
        planShuffled || builtShuffled
      } catch { case scala.util.control.NonFatal(_) => true }

    // Table-load warmup once (file listing, footer reads), then
    // QUERY-MAJOR measurement: per query — untimed warmup run, timed
    // passes, adaptive extra passes, then clearCache. First execution
    // pays codegen/JIT (measured 8s cold vs 1.7s warm on the minhash
    // family); the per-query warmup also populates the caches that
    // query's own plan persists (signature frames etc.), so the timed
    // passes measure the documented cached-signature steady state.
    // The per-query clearCache is the cache-ISOLATION discipline
    // ScaleBench adopted in round 6: without it 149 queries' internal
    // persists pile up across the whole run and the eviction/GC
    // pressure lands on whichever queries run late (alphabetic order
    // put the q9x family there). A query's cost now includes building
    // its own frames — no freeloading on an earlier query's cache.
    try {
      Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    } catch { case scala.util.control.NonFatal(_) => () }

    // EVERY query gets >= 5 timed passes (round-9 lesson: the driver's
    // record executed on a contended box, and 3-pass medians on
    // multi-second queries had no outlier protection — 140.7 s reported
    // for a 61.6 s engine). 5 samples make the n/4 trim meaningful for
    // every median; env override exists for fast local iteration only.
    val minSamples = 5
    val envPasses =
      sys.env.get("SPARK_GRAFT_BENCH_PASSES").flatMap(_.toIntOption)
    val passes = math.max(1, envPasses.getOrElse(minSamples))
    // an EXPLICIT env override is honored verbatim (fast local
    // iteration: one pass, no top-up); the >=5 floor binds the
    // default/official configuration
    val samplesFloor = envPasses.fold(minSamples)(p => math.max(1, p))
    // SPARK_GRAFT_BENCH_ONLY=q93_epoch_mix,q101_... runs a subset in
    // isolation — the solo-reproduction tool for diagnosing in-suite
    // neighborhood effects (JIT/code-cache/GC) on individual medians.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = Queries.all.sortBy(_.name)
      .filter(q => only.forall(_.contains(q.name)))
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    val byName = scala.collection.mutable.LinkedHashMap(
      names.map(q => q.name -> scala.collection.mutable.ArrayBuffer.empty[Double]): _*)
    // true median: even-length samples average the two middle elements
    // (upper-middle alone biased even-count medians slightly high)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    // Reported spread for >= 5 samples is TRIMMED (~n/4 off each end —
    // middle 3 of 5, middle 5 of 9): raw (max-min)/median only grows
    // with sample count, the opposite of what more measurement should
    // do. The trimmed MEDIAN equals the plain median (symmetric trim),
    // so medians are reported over all samples.
    def spreadOf(xs: Seq[Double]): Double = {
      val med = median(xs)
      if (med <= 0) 0.0
      else {
        val cut = if (xs.length >= minSamples) xs.length / 4 else 0
        val core = xs.sorted.slice(cut, xs.length - cut)
        (core.max - core.min) / med
      }
    }
    // Calibration probe PAIR: two fixed ~0.1-0.5 s plans timed between
    // queries, one per plan shape. Each plan's cost is constant by
    // construction, so its timing series is a pure measure of MACHINE
    // weather on that execution path during the run:
    //  - scan probe: lineitem scan + scalar agg (no exchange) — the
    //    original instrument; sees CPU/page-cache/scheduling load.
    //  - shuffle probe: the same scan pushed through a full-row hash
    //    repartition (no map-side combine, every row serialized
    //    through the exchange) + agg — sees the shuffle path (disk
    //    scratch, serialization, exchange threadpool) the scan probe
    //    is blind to. Round 16's lesson: the box's shuffle path ran
    //    ~2x slower than at the r15 record while the scan probe sat
    //    within 3%, and 8 shuffle-heavy "regressions" cost a full
    //    adjudication cycle to clear via old-HEAD A/B.
    // A contended box (external load, as in the driver's round-9
    // record — uniform 1.5-6x slowdowns, spreads to 435%) shows up as
    // sustained inflation of the matching probe, and the run
    // self-annotates instead of reading as an engine regression.
    import org.apache.spark.sql.functions.{col, sum => fsum}
    val probeTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    val shufProbeTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    def probePlan() = Tables.load(spark, sfDir, "lineitem")
      .select(fsum(col("l_extendedprice") * col("l_quantity")).as("v"))
    // the %4 filter + 16 partitions keep the probe near the scan
    // probe's cost (it samples ~300x per full suite); the repartition
    // still pushes every surviving row through serialization + scratch
    // disk + fetch, which is the path the scan probe cannot see
    def shufProbePlan() = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
      .filter(col("l_orderkey") % 4 === 0)
      .repartition(16, col("l_orderkey"))
      .agg(fsum(col("l_quantity")).as("v"))
    // Each probe is timed inside its OWN try (round-17 advice): a
    // failure in one must not desync the two series — every bracket
    // index below assumes probe i of BOTH shapes precedes query i. A
    // failed probe appends the series' running median (a neutral
    // weather sample: it can neither trip nor mask a pressure window);
    // a failure before any sample exists appends 0.0, which only the
    // run's first bracket can ever read and which the med>0 guards
    // treat as "no signal".
    def timedProbe(plan: () => org.apache.spark.sql.DataFrame,
                   into: scala.collection.mutable.ArrayBuffer[Double],
                   timed: Boolean): Unit =
      try {
        val t0 = System.nanoTime()
        plan().write.format("noop").mode("overwrite").save()
        if (timed) into += (System.nanoTime() - t0) / 1e9
      } catch { case scala.util.control.NonFatal(_) =>
        if (timed) into += (if (into.nonEmpty) median(into.toSeq) else 0.0)
      }
    def probe(timed: Boolean): Unit = {
      timedProbe(() => probePlan(), probeTimes, timed)
      timedProbe(() => shufProbePlan(), shufProbeTimes, timed)
    }
    probe(timed = false) // codegen/JIT warmup for the probe plans
    probe(timed = true)  // baseline point before the first query
    val shuffleShaped = scala.collection.mutable.Map.empty[String, Boolean]
    names.foreach { q =>
      // untimed warmup (codegen/JIT + this query's caches) doubling as
      // the plan-shape classification pass
      shuffleShaped(q.name) = warmupAndClassify(q)
      def pass(): Unit = {
        val t0 = System.nanoTime()
        // a throwing query records near-zero seconds — report it, or a
        // regression-to-error would read as a speedup
        if (!run(q)) failed += q.name
        byName(q.name) += (System.nanoTime() - t0) / 1e9
      }
      (1 to passes).foreach(_ => pass())
      def xs = byName(q.name).toSeq
      if (!failed(q.name)) {
        // every query: >= samplesFloor samples, escalating to 9 while
        // the trimmed spread stays >= 50% (bimodal timings — GC,
        // broadcast races). Round 9 gated escalation on median < 1 s
        // and only topped multi-second queries to 5 after observing a
        // 50% spread on 3 — exactly the gap that let a contended box
        // distort multi-second medians.
        (xs.length until samplesFloor).foreach(_ => pass())
        while (xs.length < 9 && spreadOf(xs) >= 0.5) pass()
      }
      spark.catalog.clearCache()
      probe(timed = true) // weather sample between queries
    }
    // Post-sweep outlier re-measure (round-10 verdict item 6, made
    // SYMMETRIC per the round-11 advice): a query whose trimmed spread
    // stayed >= 50% after escalating to 9 passes was measured under a
    // load blip (the driver's r10 run: q91 held 299% spread at 9
    // passes while its same-HEAD clean median was 4x lower).
    // Re-measure it ALONE at the end of the run — fresh warmup +
    // samplesFloor passes on a (usually) quieter box — but keep the
    // FIRST series' median as the reported metric either way: a
    // min-of-medians replacement could only ever lower totals, which
    // reports the best face of a genuinely bimodal regression and
    // makes medians non-comparable across rounds. Both medians are
    // attributable in the machine line's `remeasured` map; a reader
    // sees "first median X under spread, quiet-box retry said Y" and
    // judges the weather, the number itself stays one rule.
    // Round-14 widening (the q93/q101 lesson): the 50% intra-run
    // spread trigger missed BOTH round-13 regressions — q101 held 40%
    // spread, and q93 was measured inside a ~10 s local pressure
    // window (its bracketing probes were the run's two highest at
    // 3.5-5x the probe median) with only 5% spread because the
    // pressure spanned all passes. So re-measure on EITHER signal:
    // spread >= 40%, or a bracketing probe over 2x the run's probe
    // median (probe i precedes query i; probe i+1 follows it). A
    // false positive costs one warmup + samplesFloor passes.
    val probeMedAll = median(probeTimes.toSeq)
    val shufProbeMedAll = median(shufProbeTimes.toSeq)
    // the probe series of a query's OWN plan shape — every pressure /
    // adjustment decision below reads this, so a shuffle-path slowdown
    // is judged against the shuffle probe and vice versa
    def shapeSeries(name: String): (Seq[Double], Double) =
      if (shuffleShaped.getOrElse(name, true) && shufProbeTimes.nonEmpty)
        (shufProbeTimes.toSeq, shufProbeMedAll)
      else (probeTimes.toSeq, probeMedAll)
    def localPressure(i: Int, name: String): Boolean = {
      val (series, med) = shapeSeries(name)
      med > 0 && {
        val bracket = Seq(series.lift(i), series.lift(i + 1)).flatten
        bracket.nonEmpty && bracket.max > 2 * med
      }
    }
    // The committed per-query record from the LAST full-suite run on
    // this sf (read BEFORE this run overwrites it). Two consumers: the
    // cross-run weather anchor (probe median, below) and the round-16
    // remeasure trigger — the round-15 driver run recorded q186 at
    // 5.63 s where the same-code committed record said 1.19 s, and no
    // remeasure fired because both existing triggers look only INSIDE
    // the run (spread, bracketing probes); a query can sit in a
    // pressure window wider than its probe bracket and measure clean.
    // Divergence vs the committed record is the missing signal.
    val historyDir = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_HISTORY", "/root/repo/bench_history"))
    val sfName = java.nio.file.Paths.get(sfDir).getFileName.toString
    val detailPath = historyDir.resolve(s"detail_$sfName.json")
    val prevDetailTxt: Option[String] =
      try Some(java.nio.file.Files.readString(detailPath))
      catch { case scala.util.control.NonFatal(_) => None }
    // scan is scoped to the text AFTER the "queries": key (the last
    // object in the detail file) — the round-16 form scraped the whole
    // file, which also matched the short-key "remeasured" entries
    // ("q01":[first,retry]); a query named exactly qNN would have
    // resolved to a remeasured first-median instead of the committed
    // record (round-16 advice item 2)
    val prevMedians: Map[String, Double] = prevDetailTxt.map { txt =>
      val tail = txt.indexOf("\"queries\":") match {
        case -1 => txt
        case i  => txt.substring(i)
      }
      """"(q[0-9]+[a-z0-9_]*)":\[([0-9.]+),""".r.findAllMatchIn(tail)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }.getOrElse(Map.empty)
    // >= 2x the committed record's median fires a solo retry (one-sided:
    // a faster-than-record median is already the query's best face and
    // needs no defense). The 0.2 s floor keeps scheduling noise out.
    def crossRunDiverged(name: String, med: Double): Boolean =
      prevMedians.get(name).exists(prev => prev > 0.2 && med > 2 * prev)
    val remeasured =
      scala.collection.mutable.LinkedHashMap.empty[String, (Double, Double)]
    names.zipWithIndex.filterNot { case (q, _) => failed(q.name) }
      .foreach { case (q, i) =>
      val first = byName(q.name).toSeq
      if (median(first) > 0.2 && (spreadOf(first) >= 0.4 ||
          localPressure(i, q.name) ||
          crossRunDiverged(q.name, median(first)))) {
        run(q) // fresh warmup (codegen long evicted, caches cleared)
        val retry = (1 to samplesFloor).map { _ =>
          val t0 = System.nanoTime(); run(q); (System.nanoTime() - t0) / 1e9
        }
        spark.catalog.clearCache()
        remeasured(q.name) = (median(first), median(retry))
      }
    }
    // failed queries are excluded from the medians/total entirely — a
    // throwing query records near-zero seconds, and summing those would
    // report a regression-to-error as a speedup.
    // probe-adjusted median (round-14 verdict item 2): each query is
    // bracketed by probes i and i+1; when those ran SLOWER than the
    // run's probe median the query sat inside a local pressure window
    // (the q93 profile — bracketing probes at 3.5-5x, clean spread),
    // so the adjusted median scales the raw one down by that local
    // inflation. The factor is clamped at 1: a quieter-than-average
    // window is already the query's best measure, and inflating
    // medians from probe noise would manufacture regressions. Raw
    // medians remain the reported metric; the adjusted column exists
    // so the cross-round diff judges signal, not weather.
    val results = names.zipWithIndex
      .filterNot { case (q, _) => failed(q.name) }.map { case (q, i) =>
        val xs = byName(q.name).toSeq
        val med = median(xs)
        // bracket read from the probe of the query's own plan shape
        val (series, shapeMed) = shapeSeries(q.name)
        val bracket = Seq(series.lift(i), series.lift(i + 1)).flatten
        val factor =
          if (shapeMed > 0 && bracket.nonEmpty)
            math.min(1.0, shapeMed / (bracket.sum / bracket.length))
          else 1.0
        (q.name, med, spreadOf(xs), xs.length, med * factor)
      }
    // The harness captures only the LAST 2000 chars of stdout and
    // parses the final JSON line out of them — a line carrying 72 full
    // query names plus a per-query spread map is ~5 KB and has never
    // fit (every prior round's harness record shows parsed:null). The
    // machine line therefore uses the qNN prefix as the key (the
    // contract's own example shape: {"q1":sec,...}) and 3-decimal
    // timings; the full names and per-query spreads stay available on
    // a human-readable detail line printed BEFORE it (earlier stdout
    // only has to exist, not fit in the tail window).
    def fmt(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def short(name: String): String = name.takeWhile(_ != '_')
    val qs = results.map { case (k, v, _, _, _) => "\"" + short(k) + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // per-query relative spread (pct of median) and sample count, so an
    // outlier is attributable by name instead of hiding behind one
    // aggregate; sub-200ms medians are dominated by scheduling noise
    // and excluded from the aggregate/worst (but still listed on the
    // detail line). Detail entry shape:
    // [median_sec, spread_pct, n, probe_adjusted_median_sec, shape]
    // where shape is "x" (plan has an Exchange — judged against the
    // shuffle probe) or "s" (scan-only — judged against the scan
    // probe). Readers indexing [0..3] are unaffected.
    val detailJson = results
      .map { case (k, v, sp, n, adj) =>
        val shape = if (shuffleShaped.getOrElse(k, true)) "x" else "s"
        "\"" + k + "\":[" + fmt(v) + "," + math.round(sp * 100) + "," + n +
          "," + fmt(adj) + ",\"" + shape + "\"]" }
      .mkString("{", ",", "}")
    val measurable = results.filter(_._2 > 0.2)
    val maxSpread = if (measurable.isEmpty) 0.0 else measurable.map(_._3).max * 100
    val worst = if (measurable.isEmpty) ""
      else short(measurable.maxBy(_._3)._1)
    val failedJson = failed.map("\"" + short(_) + "\"").mkString("[", ",", "]")
    // adaptive sampling means some medians derive from more than
    // `passes` runs; report the max so the machine line doesn't claim
    // median-of-3 confidence for a median-of-9 number (per-query n is
    // in the detail entries)
    val passesMax = if (results.isEmpty) passes else results.map(_._4).max
    // Probe verdict: the probe plan is constant, so its median is the
    // run's floor and its inflation profile is the contention record.
    // `contended` trips on SUSTAINED load — >10% of probes over 2x the
    // probe median — not on a single GC'd sample (a one-off blip is
    // exactly what a max-based drift would false-flag on).
    val probeXs = probeTimes.toSeq
    val probeMed = if (probeXs.isEmpty) 0.0 else median(probeXs)
    val probeDrift =
      if (probeXs.isEmpty || probeMed <= 0) 0.0
      else (probeXs.max - probeXs.min) / probeMed
    val probeSlowFrac =
      if (probeXs.isEmpty || probeMed <= 0) 0.0
      else probeXs.count(_ > 2 * probeMed).toDouble / probeXs.length
    // same verdict for the shuffle-path probe
    val shufXs = shufProbeTimes.toSeq
    val shufMed = if (shufXs.isEmpty) 0.0 else median(shufXs)
    val shufSlowFrac =
      if (shufXs.isEmpty || shufMed <= 0) 0.0
      else shufXs.count(_ > 2 * shufMed).toDouble / shufXs.length
    // CROSS-RUN weather: within-run drift misses a box that is
    // UNIFORMLY slower than when the last committed record was taken
    // (round-10 measurement: two clean runs at 1.3-1.5x the round-9
    // medians on untouched queries, probes flat — sustained co-tenant
    // load looks like a regression without an absolute anchor). The
    // probe plan is frozen, so its median against the PREVIOUS run's
    // detail file is that anchor: probe_vs_prev_pct > ~25 means
    // "slower weather than the committed baseline", and per-query
    // comparisons against history should be scaled accordingly.
    val prevProbe: Option[Double] = prevDetailTxt.flatMap { txt =>
      """"probe_median_sec":([0-9.]+)""".r.findFirstMatchIn(txt)
        .map(_.group(1).toDouble).filter(_ > 0)
    }
    val probeVsPrevPct: Option[Long] = prevProbe
      .filter(_ => probeMed > 0)
      .map(p => math.round((probeMed / p - 1) * 100))
    val probeVsPrevJson = probeVsPrevPct.map(_.toString).getOrElse("null")
    // cross-run anchor for the shuffle path: the round-16 failure mode
    // was exactly a box whose shuffle path ran ~2x slower than at the
    // committed record while the scan probe moved 3% — with this
    // anchor that run self-annotates as contended instead of reading
    // as 8 simultaneous engine regressions
    val prevShufProbe: Option[Double] = prevDetailTxt.flatMap { txt =>
      """"shuffle_probe_median_sec":([0-9.]+)""".r.findFirstMatchIn(txt)
        .map(_.group(1).toDouble).filter(_ > 0)
    }
    val shufVsPrevPct: Option[Long] = prevShufProbe
      .filter(_ => shufMed > 0)
      .map(p => math.round((shufMed / p - 1) * 100))
    val shufVsPrevJson = shufVsPrevPct.map(_.toString).getOrElse("null")
    val contended = probeSlowFrac > 0.10 || shufSlowFrac > 0.10 ||
      probeVsPrevPct.exists(_ > 25) || shufVsPrevPct.exists(_ > 25)
    // [first_median, retry_median] per re-measured outlier — the
    // reported median is min of the two; both stay attributable here
    val remeasuredJson = remeasured
      .map { case (k, (a, b)) =>
        "\"" + short(k) + "\":[" + fmt(a) + "," + fmt(b) + "]" }
      .mkString("{", ",", "}")
    val machineLine = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","passes":$passes,"passes_max":$passesMax,"max_rel_spread_pct":${math.round(maxSpread)},"worst_spread_query":"$worst","probe_median_sec":${fmt(probeMed)},"probe_drift_pct":${math.round(probeDrift * 100)},"probe_slow_frac_pct":${math.round(probeSlowFrac * 100)},"probe_vs_prev_pct":$probeVsPrevJson,"shuffle_probe_median_sec":${fmt(shufMed)},"shuffle_probe_slow_frac_pct":${math.round(shufSlowFrac * 100)},"shuffle_probe_vs_prev_pct":$shufVsPrevJson,"contended":$contended,"remeasured":$remeasuredJson,"failed":$failedJson}"""
    val detailLine = s"""BENCH_DETAIL {"name_to_[median_sec,spread_pct,n_passes,probe_adj_sec,shape]":$detailJson}"""
    println(detailLine)
    println(machineLine)
    // Durable per-query record: the harness keeps only the last ~2 KB
    // of stdout, which destroyed the round-5 per-query history (4 of 72
    // medians survived). Write the full detail to a repo file that gets
    // committed each round, so the NEXT round can always diff complete
    // per-query medians via git history regardless of stdout capture.
    // Record-path discipline (round-17 verdict item 7 + advice):
    //  - SPARK_GRAFT_BENCH_RECORD names an explicit record file (the
    //    sf10 solo sweeps are deliberate SOLO measurements whose
    //    records must be committable; an explicit name cannot collide
    //    with the full-suite convention by accident).
    //  - the CANONICAL committed baseline detail_<sf>.json — the file
    //    crossRunDiverged and the cross-round diff gate read — is
    //    written only when the caller opts in via
    //    SPARK_GRAFT_BENCH_COMMIT=1 on a full-suite run. Round 17's
    //    judging tree carried the driver's rerun silently shadowing
    //    the builder's committed 180.3 s record; an unattended rerun
    //    now lands in detail_<sf>-latest.json instead, so the
    //    committed record survives and the rerun stays inspectable.
    //  - a leftover BENCH_RECORD export no longer stales the canonical
    //    file either: a full-suite run writes its -latest (or, opted
    //    in, canonical) record IN ADDITION to the explicit one.
    // Every path written is logged, so a record's provenance is in
    // the run log.
    val recordName = sys.env.get("SPARK_GRAFT_BENCH_RECORD")
      .map(_.trim).filter(_.nonEmpty)
    val commitRecord = sys.env.get("SPARK_GRAFT_BENCH_COMMIT").exists(_.nonEmpty)
    val fullSuite = only.isEmpty
    val recordPaths = (recordName.map(historyDir.resolve).toSeq ++
      (if (fullSuite && commitRecord) Seq(detailPath) else Seq.empty) ++
      (if (fullSuite && !commitRecord)
        Seq(historyDir.resolve(s"detail_$sfName-latest.json")) else Seq.empty))
      .distinct
    try if (recordPaths.nonEmpty) {
      java.nio.file.Files.createDirectories(historyDir)
      // probe_times preserves the full weather series in run order, so
      // a contended window is attributable to the queries measured
      // inside it (probe i brackets query i in sorted-name order)
      val probeJson = probeXs.map(fmt).mkString("[", ",", "]")
      val shufJson = shufXs.map(fmt).mkString("[", ",", "]")
      val recordJson =
        s"""{"sf":"$sfDir","passes":$passes,"passes_max":$passesMax,"total_sec":${fmt(total)},""" +
          s""""probe_median_sec":${fmt(probeMed)},"probe_drift_pct":${math.round(probeDrift * 100)},""" +
          s""""probe_vs_prev_pct":$probeVsPrevJson,""" +
          s""""shuffle_probe_median_sec":${fmt(shufMed)},""" +
          s""""shuffle_probe_vs_prev_pct":$shufVsPrevJson,""" +
          s""""contended":$contended,"probe_times":$probeJson,""" +
          s""""shuffle_probe_times":$shufJson,""" +
          s""""remeasured":$remeasuredJson,""" +
          s""""failed":$failedJson,"queries":$detailJson}""" + "\n"
      recordPaths.foreach { p =>
        java.nio.file.Files.writeString(p, recordJson)
        System.err.println(s"[bench] record written: $p" +
          (if (p == detailPath) " (canonical baseline)" else ""))
      }
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] detail file write failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
