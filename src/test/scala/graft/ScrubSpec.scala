package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{LineDedup, Redact}

/** PII redaction + corpus-wide repeated-line removal. */
class ScrubSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("redactPii: typed placeholders, counts follow redaction order") {
    val docs = Seq(
      (1L, "mail a.b-c%d@ex-1.example.org and 10.0.200.1 then 4000123412341234 ok"),
      (2L, "no pii here just 123456789012 digits"), // 12-digit run: too short
      (3L, "bare user99@h.co"),
      (4L, "")
    ).toDF("id", "text")
    val (e, i, d) = Redact.piiCounts(col("text"))
    val got = docs.select(col("id"), Redact.redactPii(col("text")).as("r"),
        e.as("e"), i.as("i"), d.as("d"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    assert(got(1L) == (("mail <EMAIL> and <IP> then <ID> ok", 1, 1, 1)))
    assert(got(2L) == (("no pii here just 123456789012 digits", 0, 0, 0)),
      "a 12-digit run is below the 13-digit floor")
    assert(got(3L) == (("bare <EMAIL>", 1, 0, 0)))
    assert(got(4L) == (("", 0, 0, 0)))
  }

  test("redactPii: an email's digits never double-count downstream") {
    // host digits would match the digit-run / IP patterns if counting
    // ran on the raw text — the fixed order redacts the email first
    val doc = Seq("ping 1234567890123@4000123412341234.example.com done")
      .toDF("text")
    val (e, i, d) = Redact.piiCounts(col("text"))
    val r = doc.select(Redact.redactPii(col("text")), e, i, d).head()
    assert(r.getString(0) == "ping <EMAIL> done")
    assert((r.getInt(1), r.getInt(2), r.getInt(3)) == ((1, 0, 0)))
  }

  test("piiReport: per-source doc and match totals") {
    val docs = Seq(
      ("s1", "a@b.co and c@d.co"), ("s1", "clean"),
      ("s2", "10.0.0.1 then 10.0.0.2 then 4111222233334444")
    ).toDF("src", "text")
    val got = Redact.piiReport(docs, col("src"), col("text"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(got("s1") == ((2L, 1L, 0L, 0L, 2L, 0L, 0L)))
    assert(got("s2") == ((1L, 0L, 1L, 1L, 0L, 2L, 1L)))
  }

  test("removeRepeatedLines: boilerplate vanishes, order survives") {
    val footer = "all rights reserved"
    val docs = Seq(
      (1L, s"alpha one\n$footer\nomega one"),
      (2L, s"alpha two\n$footer\nomega two"),
      (3L, s"$footer\n$footer"), // all-boilerplate doc → empty, retained
      (4L, "unique solo line")
    ).toDF("doc_id", "text")
    val got = LineDedup.removeRepeatedLines(docs, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "alpha one\nomega one")
    assert(got(2L) == "alpha two\nomega two")
    assert(got(3L) == "", "doc of only boilerplate survives as empty text")
    assert(got(4L) == "unique solo line")
    assert(got.size == 4)
  }

  test("removeRepeatedLines: minRepeat=3 spares a twice-occurring line") {
    val docs = Seq(
      (1L, "twice\nbody a"), (2L, "twice\nbody b"),
      (3L, "thrice\nbody c"), (4L, "thrice\nbody d"), (5L, "thrice\nbody e")
    ).toDF("doc_id", "text")
    val got = LineDedup.removeRepeatedLines(docs, "doc_id", col("text"),
        minRepeat = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "twice\nbody a", "count-2 line survives at minRepeat=3")
    assert(got(3L) == "body c", "count-3 line removed")
  }

  test("dedupLinesWithinDoc: first occurrence wins, order preserved") {
    val docs = Seq(
      (1L, "a\nb\na\nc\nb"),   // → a b c
      (2L, "x\nx\nx"),          // → x
      (3L, "solo"),
      (4L, "a\nb")              // cross-doc repeats are NOT collapsed
    ).toDF("doc_id", "text")
    val got = LineDedup.dedupLinesWithinDoc(docs, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "a\nb\nc")
    assert(got(2L) == "x")
    assert(got(3L) == "solo")
    assert(got(4L) == "a\nb", "within-doc only — no global state")
    assert(got.size == 4)
  }

  test("line dedup: null-text docs retained as empty text (both variants)") {
    val docs = Seq[(Long, String)]((1L, "a\nb"), (2L, null), (3L, "a\na"))
      .toDF("doc_id", "text")
    val within = LineDedup.dedupLinesWithinDoc(docs, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(within == Map(1L -> "a\nb", 2L -> "", 3L -> "a"),
      "null-text doc must survive as empty, not vanish")
    val corpus = LineDedup.removeRepeatedLines(docs, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(corpus.keySet == Set(1L, 2L, 3L) && corpus(2L) == "")
  }

  test("line dedup: keepCols ride through without an extra caller join") {
    val docs = Seq(
      (1L, "dup\nbody a", "web", "en"),
      (2L, "dup\nbody b", "books", "de"),
      (3L, "solo\nsolo", "web", "fr")
    ).toDF("doc_id", "text", "source", "lang")
    val rr = LineDedup.removeRepeatedLines(docs, "doc_id", col("text"),
        keepCols = Seq("source", "lang"))
    assert(rr.columns.toSeq == Seq("doc_id", "text", "source", "lang"))
    val rrm = rr.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getString(3))))
      .toMap
    assert(rrm(1L) == (("body a", "web", "en")))
    assert(rrm(2L) == (("body b", "books", "de")))
    val wd = LineDedup.dedupLinesWithinDoc(docs, "doc_id", col("text"),
        keepCols = Seq("source"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    assert(wd(3L) == (("solo", "web")))
  }

  test("encodingDamageReport: planted FFFD and mojibake accounting") {
    import graft.ops.TextAnalysis
    val docs = Seq(
      ("s1", "ok caf\u00C3\u00A9 text"),        // one mojibake digraph
      ("s1", "pure"),
      ("s2", "bad \uFFFD and \uFFFD twice"),     // two replacement chars
      ("s2", "both \u00E2\u20AC\u2122 and \uFFFD")
    ).toDF("src", "text")
    val got = TextAnalysis.encodingDamageReport(docs, col("src"), col("text"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getDouble(7)))).toMap
    assert(got("s1") == ((2L, 0L, 1L, 1L, 0L, 1L, 0.5)))
    assert(got("s2") == ((2L, 2L, 1L, 2L, 3L, 1L, 0.0)),
      "doc with both damage kinds counts once in docs_damaged")
  }

  test("repeatedLinesReport: the boilerplate review list") {
    val docs = Seq(
      (1L, "footer\nbody a"), (2L, "footer\nbody b"),
      (3L, "footer\nfooter") // same doc twice: 4 occurrences, 3 docs
    ).toDF("doc_id", "text")
    val rows = LineDedup.repeatedLinesReport(docs, "doc_id", col("text"))
      .collect()
    assert(rows.length == 1)
    assert((rows(0).getString(0), rows(0).getLong(1), rows(0).getLong(2)) ==
      (("footer", 4L, 3L)))
  }
}
