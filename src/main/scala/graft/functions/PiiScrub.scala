package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection + redaction over a text column — the scrubbing stage a
  * large-scale training-data pipeline runs before anything else sees the
  * corpus (emails, US-phone/SSN shapes, IPv4 literals → typed mask
  * tokens). Beyond-reference operator (the reference corpus is market
  * data); the shapes follow the standard public curation recipes.
  *
  * Scale design: pure per-row codegen'd string expressions — no UDF, no
  * shuffle, no state. At 100 TB this is a map-only pass that fuses into
  * whatever scan/filter stage already touches the text.
  *
  * Count ↔ redaction consistency: redaction applies the four patterns
  * in a FIXED order (email → SSN → phone → IPv4), and each category's
  * count is taken on the text with all EARLIER patterns already
  * redacted — so `n_<cat>` equals exactly the number of `[<CAT>]`
  * tokens [[redact]] emits, even on adversarial overlaps (an SSN-shaped
  * local part inside an email is counted once, as the email that
  * swallowed it; a digit run exposed by a preceding mask's boundary is
  * counted as what the redactor actually masks).
  *
  * Cross-engine determinism: patterns use explicit ASCII classes
  * (`[0-9]`, never `\d`) and no lookaround/backrefs, the subset where
  * Java regex (Spark) and RE2 (DuckDB) agree match-for-match; `\b` is
  * the ASCII word boundary in both.
  */
object PiiScrub {

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ssnRe = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  val phoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Ordered (pattern, mask) table — redaction order is part of the
    * contract. */
  val patterns: Seq[(String, String)] = Seq(
    emailRe -> "[EMAIL]", ssnRe -> "[SSN]",
    phoneRe -> "[PHONE]", ipRe -> "[IP]")

  /** Number of matches of `re` in `c` (0 on no match, null on null). */
  def countMatches(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0)))

  /** `c` with every PII match replaced by its mask token, in the fixed
    * pattern order. */
  def redact(c: Column): Column =
    patterns.foldLeft(c) { case (acc, (re, mask)) =>
      regexp_replace(acc, re, mask)
    }

  /** `c` with the patterns BEFORE `re` (in [[patterns]] order) already
    * redacted — the text [[redact]] hands to `re`'s own pass, i.e. the
    * text a consistent count for `re` must be taken on. */
  def prefixRedacted(c: Column, re: String): Column =
    patterns.takeWhile(_._1 != re).foldLeft(c) { case (acc, (p, mask)) =>
      regexp_replace(acc, p, mask)
    }

  /** Count of mask tokens [[redact]] emits for `re`'s category. */
  def countRedacted(c: Column, re: String): Column =
    countMatches(prefixRedacted(c, re), re)

  /** DuckDB mirror of [[redact]] (regexp_replace needs the 'g' flag to
    * replace all occurrences; Spark's replaces all by default; DuckDB's
    * plain single-quoted strings pass backslashes through unescaped). */
  def sqlRedact(expr: String): String =
    patterns.foldLeft(expr) { case (acc, (re, mask)) =>
      s"regexp_replace($acc, '$re', '$mask', 'g')"
    }

  /** DuckDB mirror of [[prefixRedacted]]. */
  def sqlPrefixRedacted(expr: String, re: String): String =
    patterns.takeWhile(_._1 != re).foldLeft(expr) { case (acc, (p, mask)) =>
      s"regexp_replace($acc, '$p', '$mask', 'g')"
    }
}
