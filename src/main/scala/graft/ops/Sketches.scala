package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Pipeline.wordHash60
import graft.plans.GroupedTopK

/** Mergeable sketches: KMV cardinality, Bloom membership, count-min
  * frequency — the bounded-summary family a sharded 100 TB audit
  * computes per shard and rolls up without shuffling values.
  *
  * KMV (k-minimum-values): keep the k smallest DISTINCT 60-bit hashes
  * of a value per group; the k-th smallest estimates the distinct count
  * as `(k-1) * 2^60 / h_k` (the classic bottom-k estimator — the hash
  * space is uniform, so the k-th order statistic of n distinct draws
  * sits near `k/n` of the range). Groups with fewer than k distinct
  * values carry them all and the "estimate" is exact by construction.
  *
  * Why KMV and not HyperLogLog: `approx_count_distinct`'s HLL++ is the
  * right default inside one engine, but its register layout is not
  * replayable by any other engine — this sketch is DETERMINISTIC
  * (md5-derived hashes, integer estimator arithmetic), so the DuckDB
  * oracle replays the estimate bit-for-bit, and two engines sharing
  * the recipe can exchange sketches.
  *
  * Scale shape (the whole point at 100 TB): the sketch is a bounded
  * k-longs summary obtained without ever materializing the distinct
  * set in one place — a map-side-combined distinct on (group, hash)
  * followed by the [[GroupedTopK]] bounded-heap k-min (partial heaps
  * per partition, final heaps per group; never a global sort). Sketches
  * MERGE by re-minning the union ([[kmvMerge]]), so per-shard sketches
  * roll up to corpus totals through a k-longs-per-group exchange —
  * the distinct VALUES never travel, only sketches do.
  */
object Sketches {

  /** 2^60 — the hash-space size of [[graft.Pipeline.wordHash60]]. */
  private val HashSpace = 1152921504606846976L

  /** k smallest distinct hashes of `valueCol` per group, ascending.
    * Output: groupCols plus `kmv: array<long>` (length <= k).
    */
  def kmvSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2 (the estimator divides by h_k), got $k")
    fromHashes(
      df.select((groupCols.map(col) :+
        wordHash60(col(valueCol).cast(StringType)).as("_h")): _*),
      groupCols, k)
  }

  /** Merge per-shard sketches (frames with a `kmv` column over the same
    * k) into one sketch per group: explode, distinct, re-min. Exactly
    * the sketch of the unioned inputs — bottom-k of a union is the
    * bottom-k of the pooled bottom-k's.
    */
  def kmvMerge(sketches: DataFrame, groupCols: Seq[String],
               k: Int): DataFrame =
    fromHashes(
      sketches.select((groupCols.map(col) :+
        explode(col("kmv")).as("_h")): _*),
      groupCols, k)

  /** Distinct-count estimate from a sketch: exact size when the group
    * never filled its k slots, else `(k-1) * 2^60 div h_k` — integer
    * arithmetic throughout (the product rides DECIMAL(38,0); `div`
    * lands on BIGINT), so every engine sharing the recipe computes the
    * identical estimate. Adds `est_distinct: bigint`.
    */
  def kmvEstimate(sketch: DataFrame, k: Int): DataFrame =
    sketch.withColumn("est_distinct",
      when(size(col("kmv")) < k, size(col("kmv")).cast(LongType))
        .otherwise(expr(
          // greatest(.,1): an all-but-impossible h_k = 0 (p ~ k/2^60)
          // must degrade to a huge estimate, not a division error
          s"CAST(${k - 1} AS DECIMAL(38,0)) * CAST($HashSpace AS DECIMAL(38,0))" +
            s" div greatest(element_at(kmv, $k), 1L)")))

  /** SET-OVERLAP estimate between two KMV sketches of the same k (the
    * classic KMV set-operation estimator): per group present in BOTH
    * frames, form the union sketch (bottom-k of the pooled arrays —
    * exactly the sketch of the unioned sets), estimate
    * `jaccard_ppm = 1e6 · |{h ∈ U_k : h ∈ A_k ∧ h ∈ B_k}| / |U_k|`,
    * `est_union` by the bottom-k estimator, and
    * `est_intersection = jaccard · est_union`. The cross-corpus /
    * cross-snapshot question ("how much vocabulary do two snapshots
    * share", "what fraction of domain A's shingles appear in B")
    * answered from two k-longs summaries — the underlying sets never
    * meet, never travel, and can live on different clusters.
    *
    * Shape: one group-keyed equi-join of two bounded sketch frames;
    * everything after is per-row HOF arithmetic. Groups that never
    * filled k slots estimate exactly. Output: groupCols +
    * (est_union, jaccard_ppm, est_intersection).
    */
  def kmvOverlap(a: DataFrame, b: DataFrame, groupCols: Seq[String],
                 k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val ka = a.select((groupCols.map(col) :+ col("kmv").as("_ka")): _*)
    val kb = b.select((groupCols.map(col) :+ col("kmv").as("_kb")): _*)
    ka.join(kb, groupCols)
      .withColumn("_u",
        slice(array_sort(array_union(col("_ka"), col("_kb"))), 1, k))
      .withColumn("_match",
        size(filter(col("_u"), h =>
          array_contains(col("_ka"), h) && array_contains(col("_kb"), h)))
          .cast(LongType))
      .withColumn("est_union",
        when(size(col("_u")) < k, size(col("_u")).cast(LongType))
          .otherwise(expr(
            s"CAST(CAST(${k - 1} AS DECIMAL(38,0)) * CAST($HashSpace AS DECIMAL(38,0))" +
              s" div greatest(element_at(_u, $k), 1L) AS BIGINT)")))
      .withColumn("jaccard_ppm",
        expr("(_match * 1000000L) div greatest(size(_u), 1)"))
      .withColumn("est_intersection", expr(
        "CAST(CAST(jaccard_ppm AS DECIMAL(38,0)) * CAST(est_union AS DECIMAL(38,0))" +
          " div 1000000L AS BIGINT)"))
      .drop("_ka", "_kb", "_u", "_match")
  }

  /** Shared tail: distinct (group, hash) -> bounded k-min heaps ->
    * one ascending array per group. The distinct is a map-side-combined
    * hash aggregate; the k-min is [[GroupedTopK]] with `largest=false`
    * (partial + final bounded heaps); the final `collect_list` holds at
    * most k longs per group.
    */
  private def fromHashes(hashes: DataFrame, groupCols: Seq[String],
                         k: Int): DataFrame =
    GroupedTopK.perKey(hashes.distinct(), groupCols, "_h", k, largest = false)
      .groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(col("_h"))).as("kmv"))

  // ===== Deterministic HyperLogLog (mergeable cardinality) =====

  /** Deterministic HLL register table: per group, at most `m = 2^p`
    * rows `(bucket, r)` where `bucket` is the low `p` bits of
    * [[graft.Pipeline.wordHash60]] and `r` the max leading-zero rank
    * (`rho`) of the remaining `60-p` bits — Flajolet et al.'s
    * HyperLogLog with the engine-portable hash recipe instead of an
    * opaque register blob, so two engines sharing the recipe exchange
    * and merge register tables, and the DuckDB oracle replays them
    * bit-for-bit (the same argument as [[kmvSketch]]'s docstring,
    * which rejects only the BUILT-IN HLL++'s unreplayable layout).
    *
    * Why have both: at equal summary bytes the register table is the
    * denser estimator (m 6-bit ranks vs k 60-bit order statistics —
    * standard error `1.04/sqrt(m)` vs `~1/sqrt(k-2)` per summary
    * long), and HLL merges by plain per-bucket MAX ([[hllMerge]] — an
    * aggregate, no distinct/re-min pass), which is also what makes
    * the streaming maintainer trivial state. KMV keeps the jobs HLL
    * cannot do: the [[kmvOverlap]] set algebra needs the hashes
    * themselves.
    *
    * Scale shape: one map-side-combinable `(group, bucket) -> max`
    * aggregate over the scan projection; values never travel, the
    * exchange carries <= m rows per group.
    */
  def hllSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                p: Int = 6): DataFrame =
    hllCells(df, groupCols.map(col), valueCol, p)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("_rho")).cast(LongType).as("r"))

  /** Scan-side (bucket, rho) projection shared VERBATIM by the batch
    * sketch and the streaming maintainer: appends `bucket` (low `p`
    * hash bits) and `_rho` (leading-zero rank of the remaining
    * `60-p` bits, in [1, 61-p]) to the kept columns.
    */
  private[graft] def hllCells(df: DataFrame, keep: Seq[org.apache.spark.sql.Column],
                              valueCol: String, p: Int): DataFrame = {
    require(p >= 4 && p <= 12, s"p must be in [4, 12], got $p")
    val m = 1L << p
    df.select((keep :+
        wordHash60(col(valueCol).cast(StringType)).as("_h")): _*)
      .withColumn("bucket", col("_h") % m)
      .withColumn("_rest", expr(s"_h div ${m}L"))
      // rho = leading zeros of the (60-p)-bit rest + 1: 61-p-bitlen
      // for rest >= 1 (bitlen via bin-length), 61-p when every bit is 0
      .withColumn("_rho", when(col("_rest") === 0L, lit(61L - p))
        .otherwise(lit(61L - p) - length(bin(col("_rest")))))
      .drop("_h", "_rest")
  }

  /** Merge per-shard register tables into one per group: per-bucket
    * MAX — exactly the register table of the unioned inputs (max of
    * maxes), one bounded aggregate.
    */
  def hllMerge(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("r")).cast(LongType).as("r"))

  /** Distinct-count estimate from a register table: the RAW HyperLogLog
    * estimator `alpha_m * m^2 / sum_j 2^(-r_j)` (absent buckets enter
    * at r = 0), computed in exact integer arithmetic — the harmonic
    * sum is scaled by 2^60 (every term `2^(60-r)` is an exact long,
    * summed as DECIMAL(38,0); the alpha constants are the published
    * rationals) and the final `div` floors identically on every
    * engine. DELIBERATELY no small/large-range correction: linear
    * counting needs `ln` (engine-varying libm floors); below ~2.5m
    * distinct, use the register count itself or [[kmvSketch]] (exact
    * under k) — the production split a 100 TB audit wants anyway.
    * Output: groupCols + (n_buckets, est_distinct).
    */
  def hllEstimate(sketch: DataFrame, groupCols: Seq[String],
                  p: Int = 6): DataFrame = {
    require(p >= 4 && p <= 12, s"p must be in [4, 12], got $p")
    val m = 1L << p
    // alpha_m as published: 16 -> 0.673, 32 -> 0.697, 64 -> 0.709,
    // m >= 128 -> 0.7213/(1 + 1.079/m) = 7213 m / (10000 m + 10790)
    val (aNum, aDen) = p match {
      case 4 => (673L, 1000L)
      case 5 => (697L, 1000L)
      case 6 => (709L, 1000L)
      case _ => (7213L * m, 10000L * m + 10790L)
    }
    sketch
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast(LongType).as("n_buckets"),
        sum(expr("CAST(shiftleft(1L, CAST(60 - r AS INT)) AS DECIMAL(38,0))"))
          .as("_s"))
      .withColumn("_denom", expr(
        s"_s + CAST(($m - n_buckets) AS DECIMAL(38,0)) * CAST(${1L << 60} AS DECIMAL(38,0))"))
      .withColumn("est_distinct", expr(
        s"CAST(CAST($aNum AS DECIMAL(38,0)) * $m * $m * CAST(${1L << 60} AS DECIMAL(38,0))" +
          s" div (CAST($aDen AS DECIMAL(38,0)) * _denom) AS BIGINT)"))
      .drop("_s", "_denom")
  }

  // ===== Bloom filter (mergeable membership) =====

  /** BLOOM membership sketch: per group, a `bits`-wide bitmap stored as
    * 63-bit WORDS (ceil(bits/63) longs — bit 63 never set: DuckDB's
    * BIGINT shift raises on `1 << 63`, so the portable word is 63 bits
    * and every mask stays positive on every engine) — `khash` md5-derived positions set per distinct
    * value. THE at-scale membership tool: a 100 TB decontamination
    * pre-gate ships a few KB of bitmap per shard instead of the
    * vocabulary, with a quantifiable false-positive rate
    * (`(1-e^{-kn/m})^k`) and NO false negatives — the conservative
    * direction a leakage gate needs (a Bloom "maybe" routes to the
    * exact verify; a Bloom "no" is definitive).
    *
    * Deterministic by construction (positions are
    * `hash60(i || '_' || value) % bits`), so sketches replay across
    * engines and MERGE by bitwise OR ([[bloomMerge]]) — per-shard
    * bitmaps roll up through a rows-per-group exchange of
    * ceil(bits/63) longs. Output: groupCols + (word_idx, bits) — one
    * row per word that has at least one bit set; absent words are
    * implicitly all-zero (the probe and merge operators handle the
    * absence; a consumer reading the frame directly must too).
    *
    * Shape: value explode ×khash (scan-side position arithmetic) →
    * one (group, word)-keyed `bit_or` aggregate, map-side combined,
    * output bounded by groups × ceil(bits/63).
    */
  /** The khash bit positions of a value — shared VERBATIM by the batch
    * sketch, the probe, and the streaming maintainer, so none can
    * drift. Returns `array<long>` of positions in [0, bits).
    */
  def bloomPositions(value: String, bits: Int, khash: Int)
      : org.apache.spark.sql.Column =
    expr(
      s"""transform(sequence(0, ${khash - 1}), i ->
            cast(conv(substring(md5(cast(i as string) || '_' ||
              cast($value as string)), 1, 15), 16, 10) as bigint)
              % ${bits}L)""")

  def bloomSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  bits: Int = 1024, khash: Int = 3): DataFrame = {
    require(bits >= 63, s"bits must be >= 63, got $bits")
    require(khash >= 1, s"khash must be >= 1, got $khash")
    df
      .select((groupCols.map(col) :+
        explode(bloomPositions(valueCol, bits, khash)).as("_pos")): _*)
      .select((groupCols.map(col) :+
        expr("_pos div 63").as("word_idx") :+
        expr("shiftleft(1L, cast(_pos % 63 as int))").as("_m")): _*)
      .groupBy((groupCols.map(col) :+ col("word_idx")): _*)
      .agg(bit_or(col("_m")).as("bits"))
  }

  /** OR-merge per-shard Bloom sketches (same bits/khash) into one
    * bitmap per group — the union's sketch exactly.
    */
  def bloomMerge(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy((groupCols.map(col) :+ col("word_idx")): _*)
      .agg(bit_or(col("bits")).as("bits"))

  /** Membership probe: for each (group, probe value), `might_contain` =
    * all khash positions set in the group's bitmap. Probes explode
    * ×khash, LEFT-join the sketch on (group, word) — an absent word is
    * an unset bit — and a probe is "in" iff every position hits. No
    * false negatives; false positives at the textbook rate.
    * `probes` must carry groupCols + `probeCol`.
    */
  def bloomMightContain(sketch: DataFrame, probes: DataFrame,
                        groupCols: Seq[String], probeCol: String,
                        bits: Int = 1024, khash: Int = 3): DataFrame = {
    val exploded = probes
      .select((groupCols.map(col) :+ col(probeCol)): _*)
      .select((groupCols.map(col) :+ col(probeCol) :+
        explode(bloomPositions(probeCol, bits, khash)).as("_pos")): _*)
      .withColumn("_w", expr("_pos div 63"))
    val keyed = sketch.select(
      (groupCols.zipWithIndex.map { case (g, i) => col(g).as(s"_sg$i") } :+
        col("word_idx").as("_sw") :+ col("bits").as("_sb")): _*)
    val cond = groupCols.zipWithIndex
      .map { case (g, i) => col(g) <=> col(s"_sg$i") }
      .reduce(_ && _) && col("_w") === col("_sw")
    exploded.join(keyed, cond, "left")
      .withColumn("_hit",
        expr("coalesce(_sb, 0L) & shiftleft(1L, cast(_pos % 63 as int))") =!= 0L)
      .groupBy((groupCols.map(col) :+ col(probeCol)): _*)
      .agg((count(lit(1)) === sum(when(col("_hit"), 1L).otherwise(0L)))
        .as("might_contain"))
  }

  // ===== Count-min sketch (mergeable frequency) =====

  /** COUNT-MIN frequency sketch: `depth` rows of `width` counters; an
    * occurrence of a value increments counter `(d, hash60(d||'_'||v) %
    * width)` for every row d. Estimates never UNDER-count (collisions
    * only add), the error bound is the classic `n/width` per row with
    * the min over `depth` independent rows — the bounded-memory
    * frequency table for vocabularies too large to materialize (the
    * 100 TB complement of an exact unigram count: fixed
    * `depth × width` longs per group, merge = counter-wise SUM).
    *
    * Deterministic md5-derived positions, pure integer counters — the
    * oracle replays sketch AND estimate bit-for-bit. Shape: occurrence
    * explode ×depth → one (group, d, pos) count, map-side combined,
    * output bounded by groups × depth × width.
    */
  /** The depth counter cells `(d, pos)` of a value — shared VERBATIM
    * by the batch sketch, the estimate probe, and the streaming
    * maintainer, so none can drift. `value` is a SQL expression;
    * returns `array<struct<d: long, pos: long>>`.
    */
  def cmsPositions(value: String, depth: Int, width: Int)
      : org.apache.spark.sql.Column =
    expr(
      s"""transform(sequence(0, ${depth - 1}), d -> struct(
            cast(d as bigint) as d,
            cast(conv(substring(md5(cast(d as string) || '_' ||
              cast($value as string)), 1, 15),
              16, 10) as bigint) % ${width}L as pos))""")

  def cmsSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad cms shape: $depth x $width")
    df
      .select((groupCols.map(col) :+ col(valueCol).cast(StringType).as("_v")): _*)
      .select((groupCols.map(col) :+
        explode(cmsPositions("_v", depth, width)).as("_c")): _*)
      .groupBy((groupCols.map(col) :+ col("_c.d").as("d") :+
        col("_c.pos").as("pos")): _*)
      .agg(count(lit(1)).cast(LongType).as("n"))
  }

  /** SUM-merge per-shard count-min sketches (same depth/width). */
  def cmsMerge(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy((groupCols.map(col) :+ col("d") :+ col("pos")): _*)
      .agg(sum(col("n")).cast(LongType).as("n"))

  // ===== Misra-Gries (mergeable heavy hitters) =====

  /** MISRA-GRIES summary: per group, at most `k` (value, n_lb) rows
    * where `n_lb` is a LOWER bound on the value's count with the
    * classic deficiency guarantee `true - n_lb <= N/(k+1)` (N = the
    * group's total occurrences) — the deterministic heavy-hitters
    * complement of [[cmsSketch]]: count-min never under-counts but
    * cannot enumerate its keys; Misra-Gries enumerates the candidates
    * (every value with true count > N/(k+1) is guaranteed present) at
    * the cost of under-counting. Together they bracket a frequency.
    *
    * Construction is the one-shot compress of the exact count table:
    * keep the k heaviest values, subtract the (k+1)-th heaviest count
    * from the kept counts, drop non-positive. Summaries MERGE
    * ([[mgMerge]]) by summing counters and re-compressing — the
    * mergeable-summaries result (Agarwal et al., PODS'12): the merged
    * deficiency is at most the sum of the parts', so per-shard
    * summaries roll up to a corpus summary through a <= k-rows-per-
    * group exchange; the count table never travels.
    *
    * Determinism (the oracle replays bit-for-bit): selection orders by
    * the composite `n * 2^60 + hash60(value)` so count ties break on
    * the value hash — no engine-dependent LIMIT tie. Shape: one
    * map-side-combined count, a [[GroupedTopK]] bounded-heap top-(k+1)
    * on the composite (never a vocabulary-wide sort), then a window
    * over the <= (k+1)-rows-per-group survivors.
    * Output: groupCols + (value: string, n_lb: long).
    */
  def mgSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
               k: Int): DataFrame = {
    require(k >= 1, s"Misra-Gries needs k >= 1, got $k")
    mgCompress(
      df.select((groupCols.map(col) :+
          col(valueCol).cast(StringType).as("value")): _*)
        .groupBy((groupCols.map(col) :+ col("value")): _*)
        .agg(count(lit(1)).cast(LongType).as("_n")),
      groupCols, k)
  }

  /** Merge per-shard Misra-Gries summaries (same k; a frame of pooled
    * sketch rows, like [[kmvMerge]]/[[bloomMerge]]): sum each value's
    * surviving counters across shards, re-compress. The result is a
    * valid k-summary of the union whose deficiency is bounded by the
    * sum of the shard deficiencies.
    */
  def mgMerge(sketches: DataFrame, groupCols: Seq[String],
              k: Int): DataFrame =
    mgCompress(
      sketches.groupBy((groupCols.map(col) :+ col("value")): _*)
        .agg(sum(col("n_lb")).cast(LongType).as("_n")),
      groupCols, k)

  /** Shared compress: top-(k+1) by `n * 2^60 + hash60(value)` per
    * group (bounded heaps), subtract the (k+1)-th count, keep positive.
    * Expects (groupCols, value, _n); the window runs over <= k+1 rows
    * per group, not the count table.
    */
  private def mgCompress(counts: DataFrame, groupCols: Seq[String],
                         k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = counts.withColumn("_ord", expr(
      s"CAST(_n AS DECIMAL(38,0)) * $HashSpace" +
        " + CAST(cast(conv(substring(md5(value), 1, 15), 16, 10) as bigint)" +
        " AS DECIMAL(38,0))"))
    val top = GroupedTopK.perKey(keyed, groupCols, "_ord", k + 1,
      largest = true)
    val w = Window.partitionBy(groupCols.map(col): _*)
    val wOrd = w.orderBy(col("_ord").desc)
    top
      .withColumn("_rk", row_number().over(wOrd))
      .withColumn("_csub",
        max(when(col("_rk") === k + 1, col("_n")).otherwise(0L)).over(w))
      .filter(col("_rk") <= k && col("_n") > col("_csub"))
      .select((groupCols.map(col) :+ col("value") :+
        (col("_n") - col("_csub")).cast(LongType).as("n_lb")): _*)
  }

  // ===== Log-bucket histogram (mergeable quantiles) =====

  /** LOG2-BUCKET histogram: per group, occurrence counts of a
    * non-negative long measure bucketed by bit length — bucket b holds
    * values in [2^(b-1), 2^b), bucket 0 holds exactly 0. The mergeable
    * QUANTILE summary completing the sketch family (cardinality /
    * membership / frequency / quantiles): at most 64 rows per group,
    * merge = counter SUM, and any quantile of the distribution is
    * answerable to within the bucket's 2x relative width — the right
    * tool for doc-length / token-count / bytes-per-host distributions
    * at 100 TB, where an exact percentile is a global sort nobody
    * needs.
    *
    * The bucket index is INTEGER-PURE (a count of powers of two <= v,
    * evaluated over a 63-element sequence in one codegen'd HOF) — no
    * log2 floating point, so engines can't disagree at bucket
    * boundaries. Values are expected >= 0; a NEGATIVE value clamps
    * into bucket 0 together with legitimate zeros (no power of two is
    * <= it) — pre-filter if zeros and negatives must stay separable.
    */
  def histSketch(df: DataFrame, groupCols: Seq[String],
                 valueCol: String): DataFrame =
    df.select((groupCols.map(col) :+ histBucket(valueCol).as("bucket")): _*)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(count(lit(1)).cast(LongType).as("n"))

  /** The integer-pure bucket index of a non-negative long SQL
    * expression: |{b in [0,62] : 2^b <= v}|, which for v >= 1 is
    * exactly v's BIT LENGTH — computed as `length(bin(v))` (bin() is
    * the codegen'd java.lang.Long.toBinaryString; its length is
    * floor(log2 v) + 1 for v in [1, 2^63), matching the power-of-two
    * count for the full [1, 2^62] histogram domain, and the 63-cap
    * for v > 2^62 agrees too). v <= 0 — and NULL — clamp to bucket 0
    * as documented (the IS NULL arm is explicit because `null <= 0`
    * is null, so without it the CASE would emit a NULL bucket that
    * leaks through [[histSketch]] as a NULL-keyed group and never
    * joins a probe key; the pre-round-16 HOF form dropped NULLs into
    * bucket 0 and this form preserves that contract). Shared by the
    * sketch and any probe so the recipe cannot drift.
    *
    * The earlier HOF form (filter over a materialized 63-element
    * power-of-two array) was semantically identical but allocated
    * three arrays PER ROW — measured as the dominant cost of q217's
    * histogram stage on a single-row-group scan; the bit-length form
    * is one string per row inside whole-stage codegen.
    */
  def histBucket(value: String): org.apache.spark.sql.Column =
    expr(s"""CASE WHEN CAST($value AS BIGINT) IS NULL
                    OR CAST($value AS BIGINT) <= 0L THEN 0L
             ELSE CAST(length(bin(CAST($value AS BIGINT))) AS BIGINT) END""")

  /** SUM-merge per-shard histograms into one per group. */
  def histMerge(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(sum(col("n")).cast(LongType).as("n"))

  /** TOTAL-VARIATION distance between two per-group histogram sketches
    * (same bucket recipe), in integer ppm:
    * `tv_ppm = (sum_b |shareA(b) - shareB(b)|) div 2` with shares as
    * floor-ppm (`(n_b * 1e6) div N`) — the distribution-DRIFT monitor
    * the mergeable histograms exist to feed ("did the length / score /
    * degree distribution move between snapshots or sources"), answered
    * from two 64-row summaries without touching either corpus. TV is
    * the natural bounded metric here (0 = identical, 1e6 = disjoint);
    * KL/PSI need `ln` (engine-varying libm) and diverge on empty
    * buckets, which TV handles as plain share differences. Groups
    * present in only one frame are omitted (no distribution to compare
    * against — surface those with an anti join upstream). Shape: one
    * group-bucket full-outer join of two bounded frames + two
    * group-bounded windows (<= 64 rows per partition by construction).
    * Output: groupCols + (n_a, n_b, tv_ppm).
    */
  def histDistance(a: DataFrame, b: DataFrame,
                   groupCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ka = a.select((groupCols.map(col) :+ col("bucket") :+
      col("n").as("_na")): _*)
    val kb = b.select((groupCols.map(col) :+ col("bucket") :+
      col("n").as("_nb")): _*)
    val keys = groupCols :+ "bucket"
    val g = Window.partitionBy(groupCols.map(col): _*)
    ka.join(kb, keys, "full_outer")
      .withColumn("_ta", sum(coalesce(col("_na"), lit(0L))).over(g))
      .withColumn("_tb", sum(coalesce(col("_nb"), lit(0L))).over(g))
      // a group entirely absent from one side has total 0 there: drop
      // (nothing to compare); the filter also guards the div
      .filter(col("_ta") > 0L && col("_tb") > 0L)
      .withColumn("_d", expr(
        """abs((coalesce(_na, 0L) * 1000000L) div _ta
             - (coalesce(_nb, 0L) * 1000000L) div _tb)"""))
      .groupBy(groupCols.map(col): _*)
      .agg(max(col("_ta")).cast(LongType).as("n_a"),
        max(col("_tb")).cast(LongType).as("n_b"),
        expr("CAST(sum(_d) div 2 AS BIGINT)").as("tv_ppm"))
  }

  /** Quantile estimates from a histogram: for each requested ppm
    * quantile, the smallest bucket whose cumulative count reaches
    * `ceil(ppm * N / 1e6)` (the standard inverted-CDF reading), with
    * its inclusive value upper bound `2^bucket - 1`. Per-group work is
    * a HOF walk over the <= 64 sorted (bucket, n) pairs — no window,
    * no sort beyond the 64-element array. Output: groupCols +
    * (q_ppm, bucket, value_ub), one row per group per quantile.
    */
  def histQuantiles(sketch: DataFrame, groupCols: Seq[String],
                    ppms: Seq[Int]): DataFrame = {
    require(ppms.nonEmpty && ppms.forall(p => p >= 1 && p <= 1000000),
      s"quantile ppms must be in [1, 1e6], got $ppms")
    val ppmArr = ppms.mkString(", ")
    sketch
      .groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col("bucket"), col("n"))))
        .as("_h"), sum(col("n")).cast(LongType).as("_total"))
      .select((groupCols.map(col) :+
        explode(expr(s"""transform(array($ppmArr), q -> struct(
            CAST(q AS BIGINT) AS q_ppm,
            aggregate(_h, named_struct('cum', 0L, 'b', -1L),
              (acc, e) -> IF(acc.b >= 0L OR acc.cum + e.n <
                               (CAST(q AS BIGINT) * _total + 999999L) div 1000000L,
                             named_struct('cum', acc.cum + e.n, 'b', acc.b),
                             named_struct('cum', acc.cum + e.n, 'b', e.bucket)),
              acc -> acc.b) AS bucket))""")).as("_q")): _*)
      .select((groupCols.map(col) :+ col("_q.q_ppm").as("q_ppm") :+
        col("_q.bucket").as("bucket") :+
        expr("CAST(shiftleft(1L, CAST(_q.bucket AS INT)) - 1L AS BIGINT)")
          .as("value_ub")): _*)
  }

  // ===== Bloom-pruned exact anti join (sketch-accelerated decontamination) =====

  /** EXACT anti join with a Bloom pre-gate: rows of `df` whose
    * `valueCol` does NOT appear in `deny(denyCol)` — semantically
    * identical to `df.join(deny, df(valueCol) === deny(denyCol),
    * "left_anti")`, but the plan only SHUFFLES candidates. The deny
    * side is sketched into a `bits`-wide Bloom bitmap
    * ([[bloomSketch]]), the bitmap (ceil(bits/63) longs — KBs at
    * bits = 2^20) broadcasts to every scan task, and each row tests
    * membership scan-side: a Bloom "no" is definitive (no false
    * negatives), so the clean majority never enters the join; only
    * the "maybe" sliver — true hits plus the textbook false-positive
    * rate — pays the exact verify. THE 100 TB decontamination shape
    * when the deny set is too large to broadcast exactly but its
    * bitmap is not: join traffic drops from |corpus| to |maybes|.
    *
    * Plan shape (audited): the clean branch and the verify branch
    * each SCAN `df` once — two columnar scans by design. The
    * single-scan alternative (null-keyed anti join carrying the clean
    * majority through the shuffle) hashes every clean row to the one
    * null partition — a mega-skew; two pruned scans + a sliver
    * shuffle beat one scan + a full-corpus or skewed shuffle in
    * exactly the regime this operator exists for. (Spark's own
    * InjectRuntimeFilter draws the same line: it bloom-gates semi/
    * inner probes, never anti joins.)
    *
    * Output: the surviving rows of `df`, schema unchanged.
    */
  def bloomPrunedAnti(df: DataFrame, valueCol: String, deny: DataFrame,
                      denyCol: String, bits: Int = 1 << 16,
                      khash: Int = 3): DataFrame = {
    // a NULL deny entry equality-matches nothing (it cannot remove any
    // row from an anti join) and would null the bitmap's map key —
    // drop it on both the sketch and the verify side
    val denyVals = deny.select(col(denyCol)).filter(col(denyCol).isNotNull)
    val sketch = bloomSketch(
      denyVals.withColumn("_g", lit(1)),
      Seq("_g"), denyCol, bits, khash)
    val bitmap = sketch.groupBy().agg(map_from_entries(
      collect_list(struct(col("word_idx"), col("bits")))).as("_bm"))
    val tagged = df.crossJoin(broadcast(bitmap))
      .withColumn("_pa", bloomPositions(valueCol, bits, khash))
      // NULL values: md5(NULL) nulls the positions and the forall —
      // coalesce to false routes the row to the CLEAN branch, keeping
      // it, exactly as the documented-equivalent left_anti join does
      // (a NULL key matches nothing, so anti keeps it)
      .withColumn("_maybe", coalesce(expr(
        """forall(_pa, p -> (coalesce(element_at(_bm, p div 63), 0L)
             & shiftleft(1L, cast(p % 63 as int))) != 0L)"""), lit(false)))
      .drop("_bm", "_pa")
    val clean = tagged.filter(!col("_maybe")).drop("_maybe")
    val denyKeyed = denyVals.select(col(denyCol).as("_deny_v")).distinct()
    val verified = tagged.filter(col("_maybe")).drop("_maybe")
      .join(denyKeyed, col(valueCol) === col("_deny_v"), "left_anti")
    clean.unionByName(verified)
  }

  /** Frequency estimate: per (group, probe), `est_n` = min over depth
    * rows of the probed counter (an absent counter is 0 — the probe
    * was never counted there). `est_n >= true count` always; equality
    * except under collisions. `probes` must carry groupCols +
    * `probeCol`.
    */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame,
                  groupCols: Seq[String], probeCol: String,
                  depth: Int = 4, width: Int = 256): DataFrame = {
    val exploded = probes
      .select((groupCols.map(col) :+ col(probeCol)): _*)
      .select((groupCols.map(col) :+ col(probeCol) :+
        explode(cmsPositions(probeCol, depth, width)).as("_c")): _*)
      .select((groupCols.map(col) :+ col(probeCol) :+
        col("_c.d").as("_d") :+ col("_c.pos").as("_p")): _*)
    val keyed = sketch.select(
      (groupCols.zipWithIndex.map { case (g, i) => col(g).as(s"_sg$i") } :+
        col("d").as("_sd") :+ col("pos").as("_sp") :+ col("n").as("_sn")): _*)
    val cond = groupCols.zipWithIndex
      .map { case (g, i) => col(g) <=> col(s"_sg$i") }
      .reduce(_ && _) && col("_d") === col("_sd") && col("_p") === col("_sp")
    exploded.join(keyed, cond, "left")
      .groupBy((groupCols.map(col) :+ col(probeCol)): _*)
      .agg(min(coalesce(col("_sn"), lit(0L))).cast(LongType).as("est_n"))
  }

  // ===== AMS (tug-of-war) second-moment sketch =====

  /** AMS F2 sketch (Alon–Matias–Szegedy): per group, `counters`
    * signed sums `S_c = sum over rows of sign_c(value)` with
    * `sign_c(v) = +-1` read off BIT c of the value's single 60-bit
    * md5 hash — so `E[S_c^2] = F2 = sum over distinct values of
    * frequency^2`, THE number behind self-join sizing, groupBy skew
    * screening, and repeat-rate (Gini-Simpson) audits, in `counters`
    * longs of mergeable state per group (sketches of shards ADD).
    * Everything is exact integer given the hash recipe, so engines/
    * shards/retries produce identical counters.
    *
    * ONE md5 per row, not one per (row, counter) — the round-2
    * MinHash lesson (the kernel cost IS the md5 count): the 60 hash
    * bits supply up to 60 independent-enough signs, and the explode
    * multiplies only cheap shift/mask arithmetic. Scale shape: rows
    * explode x `counters` map-side (the q281 bootstrap shape), ONE
    * shuffle of group x counters partial sums.
    */
  def amsF2Sketch(df: DataFrame, groupCols: Seq[String],
                  valueCol: String, counters: Int = 60): DataFrame =
    amsCells(df, groupCols.map(col), valueCol, counters)
      .groupBy((groupCols.map(col) :+ col("_c").cast(LongType)
        .as("c")): _*)
      .agg(sum("_sign").cast(LongType).as("s"))

  /** Scan-side (counter, sign) projection shared VERBATIM by the
    * batch sketch and the streaming maintainer (the [[hllCells]]
    * convention): appends `_c` (counter index) and `_sign` (+-1 from
    * bit `_c` of the value's single 60-bit md5) to the kept columns —
    * one row per (input row, counter), one md5 per input row.
    */
  private[graft] def amsCells(df: DataFrame,
                              keep: Seq[org.apache.spark.sql.Column],
                              valueCol: String, counters: Int)
      : DataFrame = {
    require(counters >= 8 && counters <= 60,
      s"counters must be in [8, 60] (one sign bit per 60-bit-hash " +
        s"bit), got $counters")
    df.select((keep :+
        wordHash60(concat(lit("ams_"),
          col(valueCol).cast(StringType))).as("_h")): _*)
      .withColumn("_c", explode(expr(s"sequence(0, ${counters - 1})")))
      .withColumn("_sign", expr(
        "((_h div shiftleft(1L, CAST(_c AS INT))) % 2) * 2 - 1")
        .cast(LongType))
      .drop("_h")
  }

  /** Merge per-shard AMS sketches into one per group: counters ADD
    * (the signed sum over the unioned rows) — one bounded aggregate,
    * the same merge-exactness argument as [[hllMerge]].
    */
  def amsF2Merge(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy((groupCols :+ "c").map(col): _*)
      .agg(sum(col("s")).cast(LongType).as("s"))

  /** F2 estimate from an [[amsF2Sketch]]: the mean of the squared
    * counters, `floor(sum S_c^2 / counters)` — exact integer over
    * DECIMAL(38,0) (S_c is corpus-magnitude; its square needs the
    * wide intermediate). Standard error ~ F2 * sqrt(2/counters).
    *
    * The divisor is the sketch's OWN counter count (`COUNT(*)` per
    * group — a merged sketch carries exactly one row per counter), so
    * a sketch built with non-default `counters` estimates correctly
    * with no parameter to forget; the earlier caller-supplied divisor
    * silently scaled `f2_est` by counters/60 when omitted. Output:
    * groupCols + `f2_est`.
    */
  def amsF2Estimate(sketch: DataFrame,
                    groupCols: Seq[String]): DataFrame =
    sketch.groupBy(groupCols.map(col): _*)
      .agg(expr("CAST(SUM(CAST(s AS DECIMAL(38,0)) * s)" +
        " div COUNT(*) AS BIGINT)").as("f2_est"))
}
