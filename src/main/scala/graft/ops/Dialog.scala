package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Conversation / SFT-transcript curation: instruction-tuning corpora
  * are TRANSCRIPTS (role-tagged turns), and their hygiene checks are
  * structural — does the conversation alternate roles, does it end on
  * an assistant turn, how is the token budget split between roles —
  * plus prompt-level dedup (the same question answered twice teaches
  * the model to memorize one answer; SFT dedup keys on the PROMPT,
  * not the whole transcript).
  *
  * Transcript format: turns joined by a literal delimiter (default
  * `" ||| "`), each turn `role: body` with role in
  * {user, assistant, system}. Parsing is anchored-regex only
  * (`regexp_extract` / `regexp_replace` with `^(role): `), inside the
  * Java/RE2-shared subset, so the DuckDB oracle replays it verbatim.
  * Everything here is a pure per-row projection over array HOFs —
  * zero shuffle at any scale (promptDedup adds its one digest-keyed
  * aggregate).
  */
object Dialog {

  /** Anchored role prefix — extraction returns '' on a malformed turn
    * (missing or unknown role), which the `roles_ok` flag surfaces.
    */
  val RolePrefix: String = "^(user|assistant|system): "

  /** Per-transcript structural stats and verdicts:
    *
    *   - `n_turns`, `starts_user`, `ends_assistant`, `roles_ok`
    *     (every turn carries a known role), `alternation_ok` (no two
    *     adjacent turns share a role)
    *   - `user_tok` / `asst_tok` and `asst_share_ppm` — the role
    *     token split (an SFT loss masks user turns, so the assistant
    *     share IS the supervised token budget)
    *   - `well_formed` — the conjunction the ingest gate filters on.
    *
    * Emit-all audit form (the filter-rate report shape); filter on
    * `well_formed` to apply. Pure scan-side HOFs, no shuffle.
    */
  def turnStats(docs: DataFrame, idCol: String, convCol: String,
                delimRegex: String = " \\|\\|\\| "): DataFrame =
    docs
      .select(col(idCol),
        split(col(convCol), delimRegex).as("_turns"))
      .withColumn("_roles",
        expr(s"transform(_turns, t -> regexp_extract(t, '$RolePrefix', 1))"))
      .withColumn("_bodies",
        expr(s"transform(_turns, t -> regexp_replace(t, '$RolePrefix', ''))"))
      .withColumn("n_turns", size(col("_turns")).cast("long"))
      .withColumn("starts_user",
        expr("element_at(_roles, 1) = 'user'"))
      .withColumn("ends_assistant",
        expr("element_at(_roles, -1) = 'assistant'"))
      .withColumn("roles_ok", expr("!exists(_roles, r -> r = '')"))
      // sequence(1, 0) runs DESCENDING in Spark, and element_at(_, 0)
      // throws — single-turn docs must short-circuit before the lambda
      .withColumn("alternation_ok",
        when(col("n_turns") < 2, lit(true))
          .otherwise(expr("!exists(sequence(1, size(_roles) - 1), " +
            "i -> element_at(_roles, i) = element_at(_roles, i + 1))")))
      .withColumn("user_tok", expr(
        "aggregate(zip_with(_roles, _bodies, (r, b) -> " +
          "IF(r = 'user', size(split(b, ' ')), 0)), 0L, (acc, x) -> acc + x)"))
      .withColumn("asst_tok", expr(
        "aggregate(zip_with(_roles, _bodies, (r, b) -> " +
          "IF(r = 'assistant', size(split(b, ' ')), 0)), 0L, (acc, x) -> acc + x)"))
      .withColumn("asst_share_ppm",
        expr("(1000000L * asst_tok) div greatest(user_tok + asst_tok, 1L)"))
      .withColumn("well_formed",
        col("starts_user") && col("ends_assistant") && col("roles_ok") &&
          col("alternation_ok"))
      .drop("_turns", "_roles", "_bodies")

  /** PROMPT-level dedup groups: transcripts sharing the same FIRST-turn
    * body (the prompt) collapse to one group — `(prompt_digest,
    * keep_id, n_variants)`, keeping the lowest id (deterministic).
    * The SFT-data staple: whole-transcript dedup misses the same
    * question with two different answers, which is exactly the pair
    * that teaches answer memorization. Join back on `keep_id` to
    * materialize the kept transcripts; one digest-keyed aggregate
    * (16-byte digests through the shuffle, never the transcripts).
    */
  /** First-turn-body digest — the prompt-dedup key, shared VERBATIM by
    * [[promptDedup]] and the streaming gate so batch and stream cannot
    * drift. Column-API regex args, NOT an expr() SQL string: the SQL
    * parser consumes backslash escapes and ' \|\|\| ' would reach the
    * regex engine as the match-anything alternation ' ||| '.
    */
  def promptDigest(conv: org.apache.spark.sql.Column,
                   delimRegex: String = " \\|\\|\\| ")
      : org.apache.spark.sql.Column =
    md5(regexp_replace(element_at(split(conv, delimRegex), 1),
      lit(RolePrefix), lit("")).cast("binary"))

  def promptDedup(docs: DataFrame, idCol: String, convCol: String,
                  delimRegex: String = " \\|\\|\\| "): DataFrame =
    docs
      .select(col(idCol),
        promptDigest(col(convCol), delimRegex).as("prompt_digest"))
      .groupBy(col("prompt_digest"))
      .agg(min(col(idCol)).as("keep_id"),
        count(lit(1)).cast("long").as("n_variants"))
}
