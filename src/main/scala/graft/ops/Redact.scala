package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction with order-disciplined counting — the REPORT-bearing
  * layer over the same scrub family as `TextAnalysis.scrubPii` (q61's
  * four-class email/SSN/phone/IP pass). This module exists for the
  * accounting: redaction order is fixed and the per-class counts
  * follow it (an email's digits never double-count as an IP or a
  * digit run), which `piiCounts`-over-raw-text cannot promise; it
  * also swaps the layout-specific SSN/phone classes for one
  * layout-robust digit-run class and adds the per-source rollup.
  * The email pattern is shared with `TextAnalysis.piiPatterns` — one
  * definition, two surfaces.
  *
  * Placeholder tokens rather than deletion: the surrounding text
  * keeps its structure, so downstream token counts, chunking and
  * dedup signatures stay comparable before/after the scrub.
  *
  * Pattern notes: all three patterns are RE2-safe (no lookaround, no
  * backreferences) so the same regex text runs identically on Spark's
  * Java engine and DuckDB/RE2 — which is what makes the op
  * oracle-checkable. Order matters and is fixed: emails first (an
  * email's host part would otherwise feed the IP pattern), then IPs,
  * then long digit runs.
  *
  * Scale: pure per-row projection — codegen'd `regexp_replace` /
  * `regexp_count`, no shuffle, no UDF; the report aggregates with
  * map-side combine. Regex cost is linear in text length and the
  * patterns are anchored to rare characters (@, digit runs), so the
  * scan stays CPU-cheap next to the parquet decode it rides on.
  */
object Redact {

  /** RE2-safe patterns, also valid (and identically behaved) in Java.
    * Email is THE shared definition (`TextAnalysis.piiPatterns` head). */
  val EmailRe: String = TextAnalysis.piiPatterns.head._1
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** 13–19 contiguous digits: card/account-number shaped runs. */
  val DigitRunRe = "\\b\\d{13,19}\\b"

  val EmailTag = "<EMAIL>"
  val IpTag = "<IP>"
  val IdTag = "<ID>"

  /** Redact the three PII shapes with typed placeholders (email → IP →
    * digit-run, in that fixed order). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, EmailTag),
        Ipv4Re, IpTag),
      DigitRunRe, IdTag)

  /** Per-row PII hit counts (on the ORIGINAL text, same fixed order as
    * `redactPii` — an email's digits never double-count as a run). */
  def piiCounts(text: Column): (Column, Column, Column) = {
    val noEmail = regexp_replace(text, EmailRe, EmailTag)
    val noIp = regexp_replace(noEmail, Ipv4Re, IpTag)
    (regexp_count(text, lit(EmailRe)),
      regexp_count(noEmail, lit(Ipv4Re)),
      regexp_count(noIp, lit(DigitRunRe)))
  }

  /** Per-source scrub report: docs touched and total matches by PII
    * type — the number a corpus owner reads to decide whether a source
    * needs upstream fixing rather than row-level scrubbing. */
  def piiReport(df: DataFrame, source: Column, text: Column): DataFrame = {
    val (e, i, d) = piiCounts(text)
    df.select(source.as("source"), e.as("__e"), i.as("__i"), d.as("__d"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__e") > 0, 1L).otherwise(0L)).as("docs_email"),
        sum(when(col("__i") > 0, 1L).otherwise(0L)).as("docs_ip"),
        sum(when(col("__d") > 0, 1L).otherwise(0L)).as("docs_id"),
        sum(col("__e")).as("n_email"),
        sum(col("__i")).as("n_ip"),
        sum(col("__d")).as("n_id"))
  }
}
