package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection/redaction for training corpora: scrub contact
  * information before a corpus ships to training — the standard
  * compliance stage between crawling and packing.
  *
  * Everything is a pure codegen'd column expression (regexp_count /
  * regexp_replace — no UDFs), so redaction is map-only and scales with
  * executors. Patterns deliberately use only syntax with identical
  * semantics in Java regex (Spark) and RE2 (DuckDB/others): character
  * classes, greedy quantifiers, bounded repeats — no lookaround, no
  * backreferences — so redacted corpora are oracle-checkable and
  * engine-portable (the determinism contract of [[TextOps]]).
  */
object Pii {

  /** Email addresses (conservative: lowercase corpora — extend the
    * classes for mixed case).
    */
  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  /** North-American-style phone numbers, as three explicit head
    * alternatives over a common `NNN[ .-]NNNN\b` tail:
    *
    *   - `+1…` head: anchored by the literal '+', which can never sit
    *     mid-digit-run, so separators after it may all be absent
    *     ("+1415-555-0123");
    *   - `(NNN)` head: anchored by '(' ("(415)555-1234");
    *   - bare `NNN[ .-]` head: anchored by `\b`, and the separator after
    *     the area code is REQUIRED — that pair is what stops a match
    *     starting mid-run inside longer identifiers
    *     ("ticket 91234-567-89016" must not be partially redacted).
    *
    * The tail keeps its separator required so plain 7+-digit runs
    * (order ids, timestamps) never match; a fully separator-less
    * "4155551234" is intentionally NOT matched for the same reason.
    */
  val PhonePattern =
    "(\\+1[ .-]?\\(?[0-9]{3}\\)?[ .-]?|\\([0-9]{3}\\)[ .-]?|\\b[0-9]{3}[ .-])" +
      "[0-9]{3}[ .-][0-9]{4}\\b"

  /** IPv4 literals (syntactic: 1-3 digit octets). */
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  def countMatches(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern))

  def redact(text: Column, pattern: String, replacement: String): Column =
    regexp_replace(text, pattern, replacement)

  /** One-pass scrub of all three pattern families (emails, phones, IPv4),
    * each replaced by its own tag so downstream token statistics can
    * still count redactions per kind.
    */
  def scrub(text: Column): Column =
    redact(redact(redact(text,
      EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>"),
      Ipv4Pattern, "<IP>")
}
