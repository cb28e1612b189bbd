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
}
