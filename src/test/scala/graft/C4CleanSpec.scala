package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.C4Clean

/** Closed-form pins for the C4 cleaning pass (ops/C4Clean.scala):
  * every line rule and page rule on planted docs, the funnel's
  * independent-count accounting, bad-word parameterization, and the
  * fixpoint property (cleaning a cleaned corpus is a no-op) — the
  * q153/q154 oracles hash the same rules against DuckDB at fixture
  * scale.
  */
class C4CleanSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val keptL1 = "one two three four five."
  private val keptL2 = "six seven eight nine ten!"
  private val keptL3 = "does this line have six words?"
  private val quoteL = "he said \"this line counts fine.\""

  private val docs = Seq(
    // page 1: six lines, three survive (short / no-punct / javascript
    // dropped); 3 sentences => page kept
    (1L, Seq(keptL1, "short line.", "no punct here at all",
      "this line mentions JavaScript today ok.", keptL2, keptL3)
      .mkString("\n")),
    // page 2: two good lines but only 2 sentences => dropped
    (2L, "valid line one two three.\nvalid line four five six."),
    // page 3: brace page => dropped even though one line is fine
    (3L, "code block here { int x }\nreal line one two three four five."),
    // page 4: lorem ipsum => dropped
    (4L, "Lorem Ipsum dolor sit amet consectetur.\n" +
      "second filler line with words here.\nthird filler line with words too."),
    // page 5: terminal-quote line counts as terminal punctuation; the
    // three kept lines carry 3 sentence marks => kept (exactly at the
    // gate)
    (5L, Seq(quoteL, keptL1, keptL2, "trailing junk").mkString("\n")),
    // page 6: empty text => dropped (0 sentences)
    (6L, ""))

  private lazy val df = docs.toDF("doc_id", "text")

  test("clean: line rules rewrite text, page rules gate pages") {
    val out = C4Clean.clean(df, "text").orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 5L))
    val r1 = out(0)
    assert(r1.getString(1) == Seq(keptL1, keptL2, keptL3).mkString("\n"))
    assert(r1.getAs[Int]("c4_lines_kept") == 3)
    assert(r1.getAs[Int]("c4_lines_dropped") == 3)
    assert(r1.getAs[Int]("c4_sentences") == 3)
    val r5 = out(1)
    assert(r5.getString(1) == Seq(quoteL, keptL1, keptL2).mkString("\n"))
    // quoteL's interior period + keptL1's '.' + keptL2's '!'
    assert(r5.getAs[Int]("c4_sentences") == 3)
  }

  test("funnel: independent per-rule accounting matches the closed form") {
    val f = C4Clean.funnel(df, "text").collect()(0)
    assert(f.getAs[Long]("pages") == 6L)
    assert(f.getAs[Long]("lines") == 6 + 2 + 2 + 3 + 4 + 1)
    assert(f.getAs[Long]("lines_kept") == 3 + 2 + 1 + 3 + 3 + 0)
    // few-sentences counts pages 2 (2 marks), 3 (1 mark) and 6
    // (empty); page 4 keeps 3 lines with 3 marks, so it is NOT under
    // this gate — only under the lorem rule
    assert(f.getAs[Long]("drop_few_sentences") == 3L) // pages 2, 3, 6
    assert(f.getAs[Long]("drop_brace") == 1L)         // page 3
    assert(f.getAs[Long]("drop_lorem") == 1L)         // page 4
    assert(f.getAs[Long]("drop_bad_words") == 0L)
    assert(f.getAs[Long]("pages_kept") == 2L)         // pages 1, 5
  }

  test("badWords parameter gates pages; counts land in the funnel") {
    val out = C4Clean.clean(df, "text", badWords = Seq("SEVEN"))
      .select("doc_id").as[Long].collect().toSet
    // 'seven' appears (case-insensitively) in pages 1 and 5 — exactly
    // the two survivors, so nothing passes
    assert(out.isEmpty)
    val f = C4Clean.funnel(df, "text", badWords = Seq("SEVEN")).collect()(0)
    assert(f.getAs[Long]("drop_bad_words") == 2L) // pages 1, 5
    assert(f.getAs[Long]("pages_kept") == 0L)
  }

  test("clean is a fixpoint: cleaning a cleaned corpus changes nothing") {
    val once = C4Clean.clean(df, "text")
    val twice = C4Clean.clean(
      once.select(col("doc_id"), col("text")), "text")
    val a = once.select("doc_id", "text").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val b = twice.select("doc_id", "text").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(a == b)
    // and the second pass drops zero lines
    assert(twice.agg(sum("c4_lines_dropped")).collect()(0).getLong(0) == 0L)
  }

  test("null text reads as an empty page: accounted under the sentence gate, never NULL-leaked") {
    val withNull = (docs :+ ((7L, null: String))).toDF("doc_id", "text")
    val f = C4Clean.funnel(withNull, "text").collect()(0)
    assert(f.getAs[Long]("pages") == 7L)
    assert(f.getAs[Long]("lines") == 18L + 1L) // null page = one empty line
    assert(f.getAs[Long]("drop_few_sentences") == 4L) // pages 2, 3, 6, 7
    assert(f.getAs[Long]("pages_kept") == 2L)
    assert(C4Clean.clean(withNull, "text").count() == 2L)
  }

  test("CRLF lines drop: \\z anchoring, unlike Java's $, refuses 'sentence.\\r'") {
    val crlf = Seq((1L, keptL1 + "\r\n" + keptL2 + "\r\n" + keptL3))
      .toDF("doc_id", "text")
    val f = C4Clean.funnel(crlf, "text").collect()(0)
    // first two lines end ".\r"/"!\r" — dropped (matching the
    // oracle's RE2 $ = end-of-text); only the bare last line survives
    assert(f.getAs[Long]("lines") == 3L)
    assert(f.getAs[Long]("lines_kept") == 1L)
  }

  test("trailing newline counts a trailing empty line (the oracle's string_split semantics)") {
    // Spark's split uses limit -1 (trailing empties KEPT), matching
    // DuckDB string_split — the funnel's `lines` count depends on it
    val t = Seq((1L, keptL1 + "\n" + keptL2 + "\n")).toDF("doc_id", "text")
    val f = C4Clean.funnel(t, "text").collect()(0)
    assert(f.getAs[Long]("lines") == 3L) // two real lines + trailing empty
    assert(f.getAs[Long]("lines_kept") == 2L)
    val c = C4Clean.clean(t, "text", minSentences = 2).collect()(0)
    assert(c.getAs[Int]("c4_lines_dropped") == 1)
  }

  test("plan: clean is map-only (no exchange)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val exchanges = C4Clean.clean(df, "text")
      .queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.isEmpty)
  }
}
