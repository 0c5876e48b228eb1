package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training corpora: replace emails, phone-shaped
  * numbers, and IPv4 addresses with typed placeholder tokens (the
  * standard pre-tokenization scrub — cf. the public C4 / RefinedWeb
  * pipelines).
  *
  * Pure per-row `regexp_replace` chain — codegen'd, shuffle-free, streams
  * through a 100 TB scan. Patterns deliberately use only the regex subset
  * with identical semantics in Java's engine and RE2 (character classes,
  * bounded repetition, ASCII `\b`/`\d` — no lookaround, no backrefs), so
  * the DuckDB oracle replays them verbatim.
  *
  * Redaction order is load-bearing: emails first (an email can embed
  * digit runs the later patterns would half-match), then phones, then
  * IPs.
  */
object Scrub {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b\\d{3}-\\d{4}\\b"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** `(pattern, replacement)` in application order. */
  val Rules: Seq[(String, String)] = Seq(
    EmailPattern -> "<EMAIL>",
    PhonePattern -> "<PHONE>",
    Ipv4Pattern -> "<IP>")

  /** All PII rules applied in order. */
  def redact(c: Column): Column =
    Rules.foldLeft(c) { case (acc, (pat, repl)) => regexp_replace(acc, pat, repl) }
}
