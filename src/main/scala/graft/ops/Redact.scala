package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection / redaction for training corpora: scan-side
  * `regexp_replace` / `regexp_extract_all` column transforms — no
  * shuffle, no UDF, fully inside whole-stage codegen, so the operator
  * adds nothing to a 100 TB pass beyond the regex CPU.
  *
  * The patterns deliberately stay inside the regex subset that Java
  * (Spark) and RE2 (DuckDB, the oracle) interpret identically: no
  * backreferences, no lookaround, no possessive quantifiers.
  */
object Redact {

  /** user@host.tld (host must end in an alphabetic TLD). */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** International-format phone: leading `+`, digit groups joined by
    * `-`. The mandatory `+` keeps it disjoint from IPv4 and from bare
    * numbers in prose.
    */
  val PhonePattern: String = "\\+\\d{1,3}(-\\d{1,6})+"

  /** Dotted-quad IPv4. */
  val Ipv4Pattern: String = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"

  def redactEmails(text: Column): Column =
    regexp_replace(text, EmailPattern, "<EMAIL>")

  def redactPhones(text: Column): Column =
    regexp_replace(text, PhonePattern, "<PHONE>")

  def redactIpv4(text: Column): Column =
    regexp_replace(text, Ipv4Pattern, "<IP>")

  /** Full PII sweep. Email runs FIRST (its local part can contain
    * digits the later numeric patterns would otherwise bite into);
    * phone before IP is arbitrary — the mandatory `+` and the dotted
    * quad cannot overlap.
    */
  def pii(text: Column): Column =
    redactIpv4(redactPhones(redactEmails(text)))

  /** Occurrence counts (for redaction audits / per-source PII rates). */
  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0))).cast("bigint")

  def phoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PhonePattern), lit(0))).cast("bigint")

  def ipv4Count(text: Column): Column =
    size(regexp_extract_all(text, lit(Ipv4Pattern), lit(0))).cast("bigint")

  /** Payment-card screen with the LUHN CHECKSUM: candidate = any
    * maximal digit run of 13-19 chars (card number lengths), hit = a
    * candidate whose Luhn mod-10 checksum validates — the standard
    * card-number detector, and the checksum is what separates real
    * card numbers from order ids and timestamps at ~10:1 (a random
    * digit run passes Luhn 1 in 10; a real PAN always does).
    *
    * Maximal runs come from a greedy `[0-9]+` extract-all with an HOF
    * length filter — NOT a `{13,19}` pattern with lookarounds, which
    * RE2 (the oracle's engine) does not support. The checksum is an
    * exact integer fold over the reversed digits (doubled digits fold
    * `2d-9`), inside whole-stage codegen; per-doc output
    * `(n_candidates, n_luhn_valid, flagged)` — a pure scan-side
    * projection, zero shuffle at any scale.
    */
  def luhnScreen(docs: org.apache.spark.sql.DataFrame, idCol: String,
                 textCol: String): org.apache.spark.sql.DataFrame = {
    val luhn =
      "aggregate(sequence(1, length(c)), 0L, (acc, i) -> acc + " +
        "CASE WHEN i % 2 = 1 THEN cast(substring(reverse(c), i, 1) as int) " +
        "WHEN 2 * cast(substring(reverse(c), i, 1) as int) > 9 " +
        "THEN 2 * cast(substring(reverse(c), i, 1) as int) - 9 " +
        "ELSE 2 * cast(substring(reverse(c), i, 1) as int) END) % 10 = 0"
    docs
      .select(org.apache.spark.sql.functions.col(idCol),
        expr(s"filter(regexp_extract_all($textCol, '[0-9]+', 0), " +
          s"c -> length(c) between 13 and 19)").as("_cands"))
      .select(org.apache.spark.sql.functions.col(idCol),
        size(org.apache.spark.sql.functions.col("_cands")).cast("bigint")
          .as("n_candidates"),
        size(expr(s"filter(_cands, c -> $luhn)")).cast("bigint")
          .as("n_luhn_valid"))
      .withColumn("flagged",
        org.apache.spark.sql.functions.col("n_luhn_valid") > 0L)
  }

  /** LEET-SPEAK normalization for blocklist matching: lowercase, map
    * the canonical digit/symbol substitutions onto their letters
    * (0→o 1→i 3→e 4→a 5→s 7→t 8→b @→a $→s !→i), then delete
    * `. - _ *` separators BETWEEN letters ("s.p.a.m" → "spam") while
    * leaving real word boundaries (spaces) alone. A term blocklist
    * matched on raw text misses every obfuscated spelling
    * ("v1agra", "c@sino", "s-p-a-m"); matched on this normal form it
    * does not. Pure scan-side codegen'd transforms.
    *
    * The separator deletion is a bounded-pass global regex (letter,
    * separators, letter → the two letters), applied TWICE: a global
    * replace consumes its trailing letter, so alternating runs like
    * "b.a.d" need a second pass; two passes close any run (pass one
    * halves the separator count between every letter pair). Both
    * engines apply the same two passes — no lookaround, RE2-safe.
    */
  def deobfuscate(text: Column): Column = {
    val mapped = translate(lower(text), "0134578@$!", "oieastbasi")
    val once = regexp_replace(mapped, "([a-z])[._*-]+([a-z])", "$1$2")
    regexp_replace(once, "([a-z])[._*-]+([a-z])", "$1$2")
  }

  /** Blocklist hits on the DEOBFUSCATED normal form: per doc, the
    * number of `terms` occurring as whole words of
    * `deobfuscate(text)` plus the flag. Terms must be lowercase
    * letters (the normal form's alphabet); the match is a bounded
    * size/filter HOF over the tokenized normal form against the term
    * list as a literal array — scan-side, no shuffle, no join.
    */
  def obfuscatedBlocklistScreen(docs: org.apache.spark.sql.DataFrame,
                                idCol: String, textCol: String,
                                terms: Seq[String])
      : org.apache.spark.sql.DataFrame = {
    require(terms.nonEmpty && terms.forall(_.matches("[a-z]+")),
      s"terms must be non-empty lowercase words, got $terms")
    val termArr = terms.map(t => s"'$t'").mkString(", ")
    docs
      .select(org.apache.spark.sql.functions.col(idCol),
        deobfuscate(org.apache.spark.sql.functions.col(textCol)).as("_norm"))
      .withColumn("_w", split(org.apache.spark.sql.functions.col("_norm"),
        "[^a-z]+"))
      .select(org.apache.spark.sql.functions.col(idCol),
        expr(s"CAST(size(filter(_w, w -> array_contains(array($termArr), w)))" +
          " AS BIGINT)").as("n_hits"))
      .withColumn("flagged", org.apache.spark.sql.functions.col("n_hits") > 0L)
  }

  /** k-anonymity audit: group rows by their quasi-identifier tuple
    * (`qiCols` — the columns an adversary could link on), then report
    * per `reportCols` (a prefix of the QI the reader slices by) how
    * much of the data sits in equivalence classes smaller than `k` —
    * the rows a release would re-identify. Two bounded aggregations:
    * classes ≤ rows, and the report is reportCols-sized; nothing
    * holds a per-class state beyond a count, so the audit is one
    * shuffle on the QI tuple at any corpus size (skewed QI tuples are
    * FINE here — a hot class is a count, not a buffer).
    *
    * Output per report group: n_rows, n_classes, risk_classes (size
    * < k), risk_rows, min_class (the worst class).
    */
  def kAnonymity(df: org.apache.spark.sql.DataFrame, qiCols: Seq[String],
                 reportCols: Seq[String], k: Long)
      : org.apache.spark.sql.DataFrame = {
    require(k >= 2, s"k < 2 makes every class safe by definition, got $k")
    require(reportCols.forall(qiCols.contains),
      s"reportCols must be a subset of qiCols ($reportCols vs $qiCols)")
    val classes = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("_sz"))
    classes.groupBy(reportCols.map(col): _*)
      .agg(
        sum(col("_sz")).cast("long").as("n_rows"),
        count(lit(1)).cast("long").as("n_classes"),
        sum(when(col("_sz") < k, 1L).otherwise(0L)).cast("long")
          .as("risk_classes"),
        sum(when(col("_sz") < k, col("_sz")).otherwise(0L)).cast("long")
          .as("risk_rows"),
        min(col("_sz")).cast("long").as("min_class"))
  }
}
