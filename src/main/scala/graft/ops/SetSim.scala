package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prefix-filtered set-similarity join (the PPJoin/AllPairs family —
  * Bayardo et al. WWW'07, Xiao et al. ICDE'08): the third blocking
  * paradigm next to LSH banding (probabilistic) and the inverted index
  * with df caps (frequency-bounded) — EXACT, no recall loss, no caps:
  *
  * Order every document's distinct tokens by GLOBAL RARITY (df asc,
  * token tiebreak). Two sets with Jaccard >= t must share a token in
  * each other's first `|d| - ceil(t*|d|) + 1` rarest tokens — so only
  * PREFIX tokens enter the inverted index, and candidate volume is
  * driven by rare-token collisions instead of stopword buckets. The
  * filter is LOSSLESS: every qualifying pair is a candidate, every
  * candidate is verified with the exact Jaccard.
  *
  * Scale shape: one df aggregate, one per-doc window (bounded by doc
  * length) for the prefix rank, one equi-join on prefix tokens, one
  * per-pair intersection count over candidate-restricted postings.
  * Thresholds travel as an integer fraction tNum/tDen so both the
  * prefix length (ceil) and the final acceptance test
  * (`inter * tDen >= (|a|+|b|-inter) * tNum`) are exact integer
  * arithmetic an oracle replays verbatim.
  */
object SetSim {

  /** Candidate+verify join over `(idCol, tokCol)` distinct-token rows.
    * Output: `(a_id, b_id, n_inter, n_union, jaccard_ppm)` for pairs
    * with Jaccard >= tNum/tDen, `a_id < b_id`.
    */
  def prefixFilterJoin(tokens: DataFrame, idCol: String, tokCol: String,
                       tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen,
      s"threshold must be a fraction in (0, 1], got $tNum/$tDen")
    val toks = tokens.select(col(idCol).as("_id"), col(tokCol).as("_tok"))
      .distinct()
    val sizes = toks.groupBy("_id").agg(count(lit(1)).as("_sz"))
    val dfs = toks.groupBy("_tok").agg(count(lit(1)).as("_df"))
    // prefix = the |d| - ceil(t*|d|) + 1 globally-rarest tokens;
    // ceil(t*n) = (tNum*n + tDen - 1) div tDen, integer-exact
    val ranked = toks.join(dfs, "_tok").join(sizes, "_id")
      .withColumn("_rn", row_number().over(
        Window.partitionBy("_id").orderBy(col("_df"), col("_tok"))))
      .withColumn("_plen",
        expr(s"_sz - (($tNum * _sz + $tDen - 1) div $tDen) + 1"))
    val prefix = ranked.filter(col("_rn") <= col("_plen"))
      .select(col("_id"), col("_tok"))
    val cand = prefix.select(col("_id").as("a_id"), col("_tok"))
      .join(prefix.select(col("_id").as("b_id"), col("_tok")), Seq("_tok"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    // exact verify: candidate-restricted posting join counts |a ∩ b|
    val inter = cand
      .join(toks.select(col("_id").as("a_id"), col("_tok")), Seq("a_id"))
      .join(toks.select(col("_id").as("b_id"), col("_tok")),
        Seq("b_id", "_tok"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).cast("long").as("n_inter"))
    inter
      .join(sizes.select(col("_id").as("a_id"), col("_sz").as("_sa")), "a_id")
      .join(sizes.select(col("_id").as("b_id"), col("_sz").as("_sb")), "b_id")
      .withColumn("n_union", expr("_sa + _sb - n_inter"))
      .filter(expr(s"n_inter * $tDen >= n_union * $tNum"))
      .withColumn("jaccard_ppm", expr("(n_inter * 1000000L) div n_union"))
      .select("a_id", "b_id", "n_inter", "n_union", "jaccard_ppm")
  }
}
