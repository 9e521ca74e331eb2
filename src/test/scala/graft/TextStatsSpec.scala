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
}
