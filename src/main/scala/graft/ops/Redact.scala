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
}
