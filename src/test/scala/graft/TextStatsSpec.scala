package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextAnalysis

class TextStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val stop = TextAnalysis.stopwordProfiles.head._2

  test("fused TextStats == composite combinators on the real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val both = docs.select(
      TextAnalysis.textStats(col("text"), stop).as("f"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"),
      TextAnalysis.charCountNoWs(col("text")).as("char_nws"),
      TextAnalysis.punctCount(col("text")).as("punct_n"),
      TextAnalysis.stopwordHits(col("text"), stop).as("stop_hits"))
    val mismatches = both.filter(
      col("f.n_tokens") =!= col("n_tokens") ||
        col("f.char_nws") =!= col("char_nws") ||
        col("f.punct_n") =!= col("punct_n") ||
        col("f.stop_hits") =!= col("stop_hits")).count()
    assert(mismatches == 0)
  }

  test("fused TextStats == composites on crafted edge cases") {
    val edge = Seq("", "   ", "a", " a ", "the", "THE the The",
      "a,b;c!", "tab\tand\nnewline", "éàü non-ascii", "1 2 3 numbers",
      "x" * 500, ("w " * 200).trim,
      // the divergent classes: non-space edge whitespace (Spark trim
      // strips only 0x20; split keeps empty edge tokens) and non-BMP
      // chars (code-point counting)
      "a\n", "\ta", "\t\t", " \t a \n ", "x🙂y",
      "🙂 🙂").toDF("text")
    val rows = edge.select(col("text"),
      TextAnalysis.textStats(col("text"), stop).as("f"),
      TextAnalysis.tokenCount(col("text")).as("nt"),
      TextAnalysis.charCountNoWs(col("text")).as("cn"),
      TextAnalysis.punctCount(col("text")).as("pn"),
      TextAnalysis.stopwordHits(col("text"), stop).as("sh")).collect()
    rows.foreach { r =>
      val f = r.getStruct(1)
      assert(f.getLong(0) == r.getLong(2), s"n_tokens for '${r.getString(0)}'")
      assert(f.getLong(1) == r.getLong(3), s"char_nws for '${r.getString(0)}'")
      assert(f.getLong(2) == r.getLong(4), s"punct_n for '${r.getString(0)}'")
      assert(f.getLong(3) == r.getLong(5), s"stop_hits for '${r.getString(0)}'")
    }
  }

  test("scrubPii replaces every class; repetition fractions exact on crafted docs") {
    import graft.ops.TextAnalysis
    val df = Seq(
      (1L, "mail a.b+c@ex-1.org call 555-123-4567 ssn 123-45-6789 via 192.168.0.1 end"),
      (2L, "clean text with no identifiers at all"),
      (3L, "spam spam spam spam"),   // 4 tokens, 1 distinct; 3 bigrams, 1 distinct
      (4L, "single"))                 // degenerate: no bigrams
      .toDF("id", "text")
    val out = df
      .withColumn("__w", graft.ops.NearDup.tokens(col("text")))
      .select(col("id"),
        TextAnalysis.scrubPii(col("text")).as("clean"),
        TextAnalysis.piiCounts(col("text")).as("pii"),
        TextAnalysis.dupTokenFrac(col("__w")).as("dtf"),
        TextAnalysis.dupBigramFrac(col("__w")).as("dbf"))
      .orderBy("id").collect()
    assert(out(0).getAs[String]("clean")
      == "mail <EMAIL> call <PHONE> ssn <SSN> via <IP> end")
    val pii = out(0).getStruct(2)
    assert((pii.getLong(0), pii.getLong(1), pii.getLong(2), pii.getLong(3))
      == ((1L, 1L, 1L, 1L)))
    assert(out(1).getAs[String]("clean") == "clean text with no identifiers at all")
    assert(out(2).getAs[Double]("dtf") == 0.75)       // 1 - 1/4
    assert(out(2).getAs[Double]("dbf") == 1.0 - 1.0 / 3.0)
    assert(out(3).getAs[Double]("dbf") == 0.0)        // guard, not an error
  }

  test("mixed-case stopword profiles behave like isin (no match)") {
    val df = Seq("the the THE").toDF("text")
    val mixed = Seq("The")
    val r = df.select(
      TextAnalysis.textStats(col("text"), mixed).getField("stop_hits"),
      TextAnalysis.stopwordHits(col("text"), mixed)).head
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getLong(0) == 0L) // lowercased tokens never equal "The"
  }

  test("TextStats runs inside whole-stage codegen") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = docs.select(TextAnalysis.textStats(col("text"), stop).as("f"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("text_stats")),
      plan.take(600))
  }

  // ---- tokenEntropy ----

  test("tokenEntropy: uniform doc = ln(distinct), constant doc = 0, empty doc dropped") {
    val df = Seq(
      (1L, "a b c d"),        // uniform over 4 -> H = ln 4, ppl = 4
      (2L, "a a a a"),        // one token -> H = 0, ppl = 1
      (3L, "a a b b"),        // uniform over 2 -> H = ln 2
      (4L, ""),               // no tokens -> no row
      (5L, "   \t ")).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(df, "doc_id", col("text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got.toSeq == Seq(
      (1L, 4L, 4L, r6(math.log(4)), 4.0),
      (2L, 4L, 1L, 0.0, 1.0),
      (3L, 4L, 2L, r6(math.log(2)), 2.0)))
  }

  test("tokenEntropy is maximal for the uniform distribution (bound H <= ln n_distinct)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // 1e-6 slack: the reported entropy is rounded to 6dp, so a uniform
    // doc can round UP past ln(n_distinct) by half an ulp of the grid
    val bad = TextAnalysis.tokenEntropy(docs, "doc_id", col("text"))
      .filter(col("entropy") > log(col("n_distinct")) + 1e-6 || col("entropy") < 0)
      .count()
    assert(bad == 0)
  }

  // ---- noveltyReport ----

  test("noveltyReport: first doc fully novel, exact copy fully redundant, short docs dropped") {
    val df = Seq(
      (1L, "x y z w"),        // 3 bigrams, all first-seen here
      (2L, "x y z w"),        // exact copy -> novelty 0
      (3L, "z w q"),          // "z w" seen in doc 1; "w q" new -> 1/2
      (4L, "solo"),           // < 2 tokens -> no row
      (5L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.noveltyReport(df, "doc_id", col("text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 3L, 3L, 1.0),
      (2L, 3L, 0L, 0.0),
      (3L, 2L, 1L, 0.5)))
  }

  test("noveltyReport: every bigram is novel exactly once across the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rep = TextAnalysis.noveltyReport(docs, "doc_id", col("text"))
    // sum of novel counts == number of distinct bigrams in the corpus
    val novel = rep.agg(sum("n_novel")).head.getLong(0)
    val ws = filter(graft.ops.NearDup.tokens(col("text")), w => w =!= "")
    val distinctBg = docs
      .filter(size(ws) >= 2)
      .select(explode(graft.ops.NearDup.shinglesFromTokens(ws, 2)).as("bg"))
      .distinct().count()
    assert(novel == distinctBg)
  }
}
