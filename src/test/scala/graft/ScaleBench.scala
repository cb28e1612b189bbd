package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off ~sf1 scale experiment (VERDICT r3 item 7): replicate sf0.1
  * 10x with decorrelated keys/content, then time the top-5 bench
  * queries at both scales to validate the linearity argument the
  * 100 TB design rests on. Results land in PLANS.md.
  *
  * Replication keeps per-replica statistics identical while making
  * replicas mutually unrelated (no cross-replica near-dups or key
  * collisions), so a linear operator should cost ~10x:
  * - documents: ids shifted; every TOKEN suffixed per replica, so
  *   cross-replica Jaccard is 0 and within-replica structure intact
  * - embeddings: ids shifted; elements sign-flipped by a deterministic
  *   per-(replica, dim) pattern — cross-replica cosines decorrelate,
  *   within-replica cosines are EXACTLY preserved (same flips cancel)
  * - lineitem/orders/customer: join keys shifted consistently;
  *   nation/region dims copied once
  */
object ScaleGen {
  val Out = "/root/repo/target/sf1-bench"

  private def signs(i: Int): Seq[Double] =
    if (i == 0) Seq.fill(64)(1.0)
    else (0 until 64).map { d =>
      if ((((i.toLong * 64 + d) * 2654435761L >> 7) & 1L) == 0L) 1.0 else -1.0
    }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("32", "scale-gen")
    val sf = "/root/testdata/sf0.1"
    val reps = 10

    // args = table-name subset to (re)generate; empty = everything
    def write(name: String, df: => DataFrame): Unit =
      if (args.isEmpty || args.contains(name)) {
        df.write.mode("overwrite").parquet(s"$Out/$name.parquet")
        println(s"wrote $name")
      }

    val docs = Tables.documents(spark, sf)
    write("documents", (0 until reps).map { i =>
      docs.select(
        (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          x => concat(x, lit(s"_r$i"))), " ").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _))

    val emb = Tables.embeddings(spark, sf)
    // vec_id shift matches documents' doc_id shift so id-equality
    // joins across the two tables (q162 crossmodal) stay 1:1 per
    // replica; embedding-only queries only need uniqueness
    write("embeddings", (0 until reps).map { i =>
      emb.select(
        (col("vec_id") + lit(i * 10000000L)).as("vec_id"),
        zip_with(col("embedding"), typedLit(signs(i)),
          (x, s) => (x * s).cast("float")).as("embedding"),
        col("label"))
    }.reduce(_ unionAll _))

    val off = 100000000L
    val li = Tables.lineitem(spark, sf)
    write("lineitem", (0 until reps).map { i =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(i * off))
        .withColumn("l_partkey", col("l_partkey") + lit(i * off))
    }.reduce(_ unionAll _))

    val ord = Tables.orders(spark, sf)
    write("orders", (0 until reps).map { i =>
      ord.withColumn("o_orderkey", col("o_orderkey") + lit(i * off))
        .withColumn("o_custkey", col("o_custkey") + lit(i * off))
    }.reduce(_ unionAll _))

    val cust = Tables.customer(spark, sf)
    write("customer", (0 until reps).map { i =>
      cust.withColumn("c_custkey", col("c_custkey") + lit(i * off))
    }.reduce(_ unionAll _))

    // events: 10x the user population with the same per-user temporal
    // pattern — the event operators (funnel/retention/json) are
    // user-keyed, so decorrelated user ids are the scaling dimension
    val ev = Tables.events(spark, sf).drop("ts")
      .withColumnRenamed("ts_ns", "ts") // write back as raw nanos longs
    write("events", (0 until reps).map { i =>
      ev.withColumn("user_id", col("user_id") + lit(i * 1000000L))
        .withColumn("event_id", col("event_id") + lit(i * off))
    }.reduce(_ unionAll _))

    write("nation", Tables.nation(spark, sf))
    write("region", Tables.region(spark, sf))

    // part replicates with keys shifted consistently with
    // lineitem.l_partkey; supplier copies ONCE like the dims —
    // l_suppkey is deliberately unshifted (the hub-skew dimension the
    // PageRank sweeps exercise), so supplier joins stay consistent
    val prt = Tables.part(spark, sf)
    write("part", (0 until reps).map { i =>
      prt.withColumn("p_partkey", col("p_partkey") + lit(i * off))
    }.reduce(_ unionAll _))
    write("supplier", Tables.supplier(spark, sf))
    spark.stop()
  }
}

/** ~sf10 (100x sf0.1) documents replica set — the second decade of
  * scaling evidence for the flagship dedup chain (VERDICT r9 item 3).
  * Same decorrelation recipe as [[ScaleGen]]: ids shifted by replica,
  * every token suffixed per replica so cross-replica Jaccard is 0 and
  * within-replica near-dup structure intact.
  */
object Scale10Gen {
  val Out = "/root/repo/target/sf10-bench"
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("32", "scale10-gen")
    val sf = "/root/testdata/sf0.1"
    def write(name: String, df: => DataFrame): Unit =
      if (args.isEmpty || args.contains(name)) {
        df.repartition(32).write.mode("overwrite")
          .parquet(s"$Out/$name.parquet")
        println(s"wrote sf10 $name")
      }
    val docs = Tables.documents(spark, sf)
    write("documents", (0 until 100).map { i =>
      docs.select(
        (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          x => concat(x, lit(s"_r$i"))), " ").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _))
    // lineitem/orders at 100x for the second decade of the trade-graph
    // family (q171/q184): keys shifted per replica like ScaleGen;
    // l_suppkey deliberately unshifted — the hub-skew dimension keeps
    // 100x degree on the supplier side, the adversarial shape
    val off = 100000000L
    val li = Tables.lineitem(spark, sf)
    write("lineitem", (0 until 100).map { i =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(i * off))
        .withColumn("l_partkey", col("l_partkey") + lit(i * off))
    }.reduce(_ unionAll _))
    val ord = Tables.orders(spark, sf)
    write("orders", (0 until 100).map { i =>
      ord.withColumn("o_orderkey", col("o_orderkey") + lit(i * off))
        .withColumn("o_custkey", col("o_custkey") + lit(i * off))
    }.reduce(_ unionAll _))
    // round 13: events at 100x users (temporal/warehouse family
    // q226-q230 — per-user history length is PRESERVED, the user
    // dimension scales; written back as raw nanos longs like ScaleGen
    // so Tables.events' LongType branch reads it), embeddings at 100x
    // (q233's corpus side; per-(rep, dim) sign flips decorrelate
    // cross-replica cosines, exactly ScaleGen.signs as a column
    // expression), customer at 100x with supplier copied once (q232's
    // blocked pair volume grows 100x on the customer side)
    val ev13 = Tables.events(spark, sf).drop("ts")
      .withColumnRenamed("ts_ns", "ts")
    write("events", ev13
      .select(col("*"), explode(expr("sequence(0, 99)")).as("rep"))
      .withColumn("user_id", col("user_id") + col("rep") * 1000000L)
      .withColumn("event_id", col("event_id") + col("rep") * off)
      .drop("rep").repartition(32))
    write("embeddings", Tables.embeddings(spark, sf)
      .select(col("*"), explode(expr("sequence(0, 99)")).as("rep"))
      .select(
        (col("vec_id") + col("rep") * 10000000L).as("vec_id"),
        zip_with(col("embedding"), expr("sequence(0, 63)"),
          (x, dIdx) => (x * when(
            expr("rep").cast("long").*(lit(64L)).+(dIdx.cast("long"))
              .*(lit(2654435761L)).bitwiseAND(lit(128L)) === 0L,
            lit(1.0d)).otherwise(lit(-1.0d))).cast("float"))
          .as("embedding"),
        col("label")).repartition(16))
    write("customer", Tables.customer(spark, sf)
      .select(col("*"), explode(expr("sequence(0, 99)")).as("rep"))
      .withColumn("c_custkey", col("c_custkey") + col("rep") * off)
      .drop("rep").repartition(8))
    write("supplier", Tables.supplier(spark, sf))
    spark.stop()
  }
}

/** Flagship dedup-chain timing at three decades (sf0.1 / ~sf1 / ~sf10):
  * decontaminate -> containment -> leakage-safe split, per-stage
  * attribution (one warmup + median of 3 per stage per scale).
  */
/** ~sf100 (1000x sf0.1) documents-only replica set — the THIRD decade
  * for the bounded-state sketch family (round-11 verdict item 8): the
  * flat lines (q208 MG, q209 histogram) claim corpus-size-free cost
  * beyond the map-side scan, and 1000x is where that claim matters.
  * Same decorrelation recipe as [[Scale10Gen]] (ids shifted, tokens
  * suffixed per replica), generated as ONE explode plan — a 1000-branch
  * union spends minutes in analysis for no reason.
  */
object Scale100Gen {
  val Out = "/root/repo/target/sf100-bench"
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("32", "scale100-gen")
    val sf = "/root/testdata/sf0.1"
    def want(n: String) = args.isEmpty || args.contains(n)
    if (want("documents")) {
      Tables.documents(spark, sf)
        .select(explode(expr("sequence(0, 999)")).as("rep"),
          col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
        .select(
          (col("doc_id") + col("rep") * 10000000L).as("doc_id"),
          array_join(transform(split(col("text"), " "),
            x => concat(x, lit("_r"), col("rep").cast("string"))), " ")
            .as("text"),
          col("lang"), col("source"), col("n_chars"))
        .repartition(64)
        .write.mode("overwrite").parquet(s"$Out/documents.parquet")
      println("wrote sf100 documents")
    }
    // trade tables at 1000x for the THIRD graph-family decade
    // (q219/q125 class): keys shifted per replica like Scale10Gen,
    // l_suppkey deliberately UNSHIFTED — 1000x supplier degree, the
    // adversarial hub-skew shape at its deepest measured point.
    // JOIN-KEY COLUMNS ONLY: the graph queries read nothing else
    // (pruning makes the scan identical), and the full-width tables at
    // 1000x (14 GB lineitem) left too little scratch for the sweep's
    // shuffle spill on this box — the first attempt died on disk, not
    // memory
    val off = 100000000L
    if (want("lineitem")) {
      Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey")
        .select(col("*"), explode(expr("sequence(0, 999)")).as("rep"))
        .withColumn("l_orderkey", col("l_orderkey") + col("rep") * off)
        .drop("rep")
        .repartition(128)
        .write.mode("overwrite").parquet(s"$Out/lineitem.parquet")
      println("wrote sf100 lineitem")
    }
    if (want("orders")) {
      Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
        .select(col("*"), explode(expr("sequence(0, 999)")).as("rep"))
        .withColumn("o_orderkey", col("o_orderkey") + col("rep") * off)
        .withColumn("o_custkey", col("o_custkey") + col("rep") * off)
        .drop("rep")
        .repartition(128)
        .write.mode("overwrite").parquet(s"$Out/orders.parquet")
      println("wrote sf100 orders")
    }
    // round 13: events at 1000x users for the temporal-warehouse
    // family's third decade (q226 per-key windows, q229 QI-count
    // shuffle, q236 single window pass). Same recipe as Scale10Gen's
    // events (ts written back as raw nanos longs; per-user history
    // preserved, the user dimension scales); projected to the five
    // columns those queries read so the 100M-row table stays ~4 GB —
    // the full-width lesson from the lineitem attempt applied upfront.
    if (want("events")) {
      Tables.events(spark, sf).drop("ts")
        .withColumnRenamed("ts_ns", "ts")
        .select("user_id", "event_type", "ts", "event_id", "value")
        .select(col("*"), explode(expr("sequence(0, 999)")).as("rep"))
        .withColumn("user_id", col("user_id") + col("rep") * 1000000L)
        .withColumn("event_id", col("event_id") + col("rep") * off)
        .drop("rep")
        .repartition(128)
        .write.mode("overwrite").parquet(s"$Out/events.parquet")
      println("wrote sf100 events")
    }
    spark.stop()
  }
}

object Scale10Chain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("32", "scale10-chain")
    // default = the flagship chain; pass names (documents-only
    // queries — the sf10 set holds just that table) for targeted
    // second-decade sweeps, e.g. the pair-volume-honest verify family
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q61_decontamination", "q92_containment_pairs",
        "q104_leakage_safe_split")
    def run(name: String, dir: String): Unit =
      Queries.byName(name).build(spark, dir).write.format("noop").mode("overwrite").save()
    // SPARK_GRAFT_SCALE_DIRS overrides the decade list (e.g. the
    // sketch family's third decade runs sf0.1 + sf10 + sf100)
    val dirs = sys.env.get("SPARK_GRAFT_SCALE_DIRS")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq("/root/testdata/sf0.1", ScaleGen.Out, Scale10Gen.Out))
    for (dir <- dirs) {
      for (n <- names) {
        run(n, dir)
        // shuffle files release only when the ContextCleaner sees
        // their ShuffleDependency GC'd — a 64 GB heap defers that
        // ~indefinitely, so big-input passes ACCUMULATE ~20 GB of
        // spill each and exhausted the box twice (q219 sf100,
        // PLANS.md round 12). A GC hint BETWEEN passes bounds scratch
        // at ~one pass's spill; it runs outside the timed window.
        System.gc(); Thread.sleep(2000)
        // SPARK_GRAFT_SCALE_PASSES trims the timed passes (default 3)
        // for decades where per-pass shuffle spill accumulates against
        // the box's scratch (the q219-at-1000x disk lesson)
        val passes = sys.env.get("SPARK_GRAFT_SCALE_PASSES")
          .map(_.toInt).getOrElse(3)
        val xs = (1 to passes).map { _ =>
          val t0 = System.nanoTime(); run(n, dir)
          val t = (System.nanoTime() - t0) / 1e9
          System.gc(); Thread.sleep(2000)
          t
        }.sorted
        println(f"""{"dir":"$dir","query":"$n","median_sec":${xs(xs.size / 2)}%.2f,"passes":[${xs.map(x => f"$x%.2f").mkString(",")}]}""")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}

/** Timed pass of the 5 most expensive round-3 queries at sf0.1 and the
  * generated ~sf1 replica set (one warmup + median of 3 per scale).
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("32", "scale-bench")
    val allNames = Seq("q61_decontamination", "q50_knn_join",
      "q65_embedding_decontamination", "q49_correlated_subquery", "q11_star_join",
      "q27_jaccard_neardup", "q70_embedding_neardup_survivors",
      "q68_stratified_sample", "q69_sequence_packing",
      // round 6: the new operators with data-proportional stages.
      // q77's centroid count is tied to the corpus by the id modulus,
      // so its n x k cost grows ~100x at 10x rows — expected: real
      // k-means holds k fixed as n grows; the ratio documents that.
      "q74_bigram_topk", "q75_tfidf_keywords", "q76_embedding_quantization",
      "q77_centroid_assign", "q78_curriculum_order",
      "q80_contamination_report", "q81_snapshot_diff", "q82_source_health",
      // round-6 second pass: components (pair graph ~10x, same
      // diameter), events (10x decorrelated users), mixing/coverage
      // (linear scans), SemDeDup (n and k both 10x -> n^2/k stays
      // linear — the paper's sizing argument, measured)
      "q84_dedup_components", "q85_funnel", "q86_retention_cohorts",
      "q87_temperature_mix", "q88_vocab_coverage", "q89_json_extract",
      "q90_semantic_dedup",
      // round-6 third pass: resolution/containment over the 10x pair
      // graph, epoch mixing (linear), novelty + corpus-analysis
      // family. NOTE q97's fixed terms don't match the replica set's
      // suffixed tokens — the timing still covers the dominant
      // explode+filter scan; the agg side is exercised at sf0.1.
      "q91_dedup_keep_best", "q92_containment_pairs", "q93_epoch_mix",
      "q94_ngram_novelty", "q95_info_content", "q96_dup_ngram_fraction",
      "q97_keyword_search", "q98_boilerplate_prefixes",
      "q99_norm_outliers", "q100_priority_sample", "q101_simhash64_pairs",
      // round-6 final batch: blocked SemDeDup (n x k term bounded by
      // probing), splits (scan-side + pair-graph propagation),
      // boilerplate strip (dimension join), chunking (explode ~x2)
      "q102_semantic_dedup_blocked", "q103_hash_split",
      "q104_leakage_safe_split", "q105_strip_boilerplate",
      "q106_chunking", "q107_chunk_dedup_map",
      "q108_split_leak_audit", "q109_budget_selection",
      // round 8: BM25 (posting probe + broadcast stats), seeded global
      // shuffle (hierarchical scaffold), sketch-estimated pairs (fixed
      // signature payload vs unbounded shingle arrays)
      "q111_bm25_search", "q112_deterministic_shuffle",
      "q113_estimated_jaccard_pairs", "q114_boundary_overlap",
      "q115_canary_scan", "q116_incremental_ingest",
      "q117_quality_model_score", "q118_embedding_drift",
      // round-8 second pass: blocked ANN with label filter, token-key
      // windows (divergence), pair-graph rollups (dup matrix, savings,
      // features), winnowing (doc-keyed window + fp join), PageRank
      // (NOTE: l_suppkey is NOT replica-shifted, so supplier nodes
      // have 10x degree at sf1 — the hub-skew case, intentionally
      // exercised), transitions (user-keyed window), heavy hitters
      // (GroupedTopK), quantiles + shuffle order (prefix-sum scaffold)
      "q119_hard_negatives", "q120_source_divergence",
      "q121_duplication_matrix", "q122_collocations",
      "q123_length_histogram", "q124_winnowed_overlap",
      "q125_pagerank", "q126_event_transitions", "q127_heavy_hitters",
      "q129_exact_quantiles", "q130_dedup_savings",
      "q131_shard_balance", "q132_pair_features",
      // skip-grams (3x pair stream), language margin (scan-side),
      // source entropy (token-key window + source agg); the two
      // composition reports (q130's pair-graph cost + tiny aggs)
      "q133_skipgram_collocations", "q134_language_margin",
      "q135_source_entropy", "q136_cluster_sizes",
      "q137_frequency_spectrum", "q138_verified_pairs_hashed",
      "q139_split_balance",
      // round 9: exact decontamination (gram-hash membership join —
      // NOTE the replica set's suffixed tokens decorrelate train/eval
      // grams across replicas, so the eval set is ~10x and hit volume
      // stays per-replica: the intended shape), bigram info (two
      // token-key windows), BPE pairs (vocabulary-sized explode —
      // sublinear in corpus tokens by design), target mix (scaffold +
      // driver-side strata counts), diversity (dims-keyed agg),
      // repetition screen (pure scan), quantile buckets (scaffold)
      "q140_exact_decontamination", "q141_bigram_info", "q142_bpe_pairs",
      "q143_target_mix", "q144_embedding_diversity",
      "q145_max_token_run", "q146_quantile_buckets",
      // round 9: DSIR importance (token-key window + target-count
      // join), dangling PageRank (one extra nodes-sized agg/iter over
      // the q125-family loop; directed graph so suppliers are sinks
      // AND unshifted l_suppkey gives them 10x degree at sf1)
      "q147_importance_score", "q148_pagerank_dangling",
      // round 10: FULL-inventory closure (verdict item 3) — the ~70
      // queries with no prior 10x evidence. Mostly the cheap half of
      // the inventory: single-agg scans, dimension joins (nation/
      // region copy once -> flat), set ops, window families, and the
      // sampling/scoring scans. part replicates key-shifted with
      // lineitem.l_partkey; supplier copies once (unshifted l_suppkey
      // = the deliberate hub-skew dimension).
      "q01_pricing_summary", "q02_grouped_count", "q03_filtered_count",
      "q04_status_pivot", "q05_existence", "q06_proj_rename",
      "q07_prefix_filter", "q08_topk_search", "q09_null_tolerant_prefix",
      "q10_code_synthesis", "q12_semi_join", "q13_anti_join",
      "q14_hierarchy_join", "q15_union", "q16_intersect", "q17_except",
      "q18_last_writer_wins", "q19_running_total", "q20_monthly_rollup",
      "q21_scalar_funcs", "q22_regex_classify", "q23_distinct_agg",
      "q24_exact_dedup", "q25_fingerprint_dedup",
      "q26_minhash_lsh_candidates", "q28_simhash_neardup",
      "q29_cosine_topk", "q30_ann_bucketed", "q31_embedding_neardup",
      "q32_langid", "q33_quality_score", "q34_token_stats",
      "q35_multimodal_features", "q36_outer_join", "q37_rollup",
      "q38_window_rank", "q39_group_collect", "q40_date_funcs",
      "q41_asof_join", "q42_range_join", "q43_approx_distinct",
      "q44_cube", "q45_regex_tokens", "q46_null_semantics",
      "q47_array_ops", "q48_grouped_topk", "q51_salted_agg",
      "q52_ivf_ann", "q53_approx_quantile", "q54_sessionization",
      "q55_frame_sampling", "q56_window_distribution", "q57_pivot",
      "q58_unpivot", "q59_set_ops_all", "q60_string_funcs2",
      "q62_grouping_sets", "q63_array_hof", "q64_recursive_hierarchy",
      "q66_repetition_score", "q67_quality_gate",
      "q71_simhash64_signatures", "q72_vocab_topk", "q73_pii_redaction",
      "q79_length_buckets", "q83_weighted_sample",
      "q110_dataset_card", "q128_diverse_sample",
      // round 10: the new operator families (q149-q153) get first-
      // decade evidence alongside the closure. q149/q150's merge loop
      // is vocabulary-bounded (sublinear in corpus tokens); q151's
      // phash pair join is pigeonhole-blocked; q152/q153 are one
      // host-keyed aggregate (+ one join for the cap filter)
      "q149_bpe_train", "q150_bpe_segment", "q151_phash_neardup",
      "q152_host_stats", "q153_host_cap_sample",
      // round 10: real-tokenizer packing (q150's segment chain + one
      // doc-keyed join + the prefix-sum scaffold)
      "q154_bpe_packing",
      // round 10, second batch: span dedup (linear explode + hashed df
      // agg + equi-join), encoding QA (pure scan), fertility (q150
      // chain + one group agg), hybrid RRF (two bounded top-20
      // retrievals + a 40-row fusion)
      "q155_strip_dup_spans", "q156_encoding_qa",
      "q157_tokenizer_fertility", "q158_hybrid_rrf",
      // round 10, batches 3-4: host family (bounded host keys), HITS
      // (post plan-fix: driver-collected normalization literals), the
      // outlink host graph + PR, prefix-sum blocking, pure-scan decay
      // weights, gram-explode repetition, dialog/Luhn/unk scans, and
      // the burst screen's bounded day-count windows
      "q169_host_dup", "q170_host_lang_mix", "q171_hits",
      "q172_host_graph_rank", "q173_context_blocks",
      "q174_freshness_decay", "q175_repetition_rules",
      "q176_dialog_stats", "q177_prompt_dedup", "q178_luhn_screen",
      "q179_event_bursts", "q180_unk_rate",
      // round 10, batch 5: anchor terms (bounded GroupedTopK), CDC
      // chunk dedup (scan-side boundary HOFs + digest window), the
      // authority-sampling composition (bounded host graph + scan
      // filter)
      "q181_anchor_text", "q182_cdc_dup", "q183_authority_sample",
      // round 10, batch 6: degree bands (two bounded aggs), bloom /
      // cms sketches (explode xk -> bounded counter/bitmap aggs,
      // probes join bounded frames)
      "q184_degree_histogram", "q185_bloom_membership",
      "q186_cms_frequency",
      // round 10, batch 7: scan-side strong canonicalization + one
      // bounded agg; token-budget mix on the prefix-sum scaffold
      "q187_url_dedup_strong", "q188_target_mix_tokens")
    // targeted reruns: pass query names as args to time a subset
    val names = if (args.nonEmpty) args.toSeq else allNames
    def run(name: String, dir: String): Unit =
      Queries.byName(name).build(spark, dir).write.format("noop").mode("overwrite").save()
    for (dir <- Seq("/root/testdata/sf0.1", ScaleGen.Out)) {
      for (n <- names) {
        run(n, dir)
        val xs = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); run(n, dir); (System.nanoTime() - t0) / 1e9
        }.sorted
        println(f"""{"dir":"$dir","query":"$n","median_sec":${xs(1)}%.2f,"passes":[${xs.map(x => f"$x%.2f").mkString(",")}]}""")
        // drop THIS query's caches before the next one: each query's
        // warmup still populates the caches its timed passes read (the
        // measured cached-signature form), but they must not pile up
        // ACROSS queries — 36 queries x 10x frames of retained cache
        // previously drove GC/spill pressure that inflated late queries
        // up to 40x (q49 61 s in-harness vs 1.6 s isolated, same plan)
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
