package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The C4 cleaning pass (Raffel et al. 2020, §2.2 "Colossal Clean
  * Crawled Corpus") — the one named filter chain the text layer was
  * missing next to the Gopher gates (`TextAnalysis.gopherFunnel`) and
  * the classifier gate (`TextClassifier.classifierGate`):
  *
  *  line rules (applied first):
  *   L1 keep only lines ending in terminal punctuation (. ! ? ")
  *   L2 keep only lines with ≥ `minLineWords` words
  *   L3 drop lines containing "javascript" (case-insensitive)
  *  page rules (on the line-cleaned text):
  *   P1 drop pages with fewer than `minSentences` sentences
  *   P2 drop pages whose ORIGINAL text contains "{" (code)
  *   P3 drop pages whose original text contains "lorem ipsum"
  *   P4 drop pages containing any of `badWords` (C4 ships a large
  *      list; parameterized here, default empty)
  *
  * C4's remaining rules live elsewhere in the engine: the
  * three-sentence-span corpus dedup is `NearDup.removeExactSubstrings`
  * / `LineDedup.removeRepeatedLines`, and the langid ≥ 0.99 cut is
  * `TextAnalysis.langId`.
  *
  * Scale shape: everything is a PURE PROJECTION over codegen'd
  * higher-order functions (`filter` on the split-line array — no
  * explode, no shuffle; a 100 TB corpus cleans map-only), plus one
  * global aggregate for the funnel report. Sentence counting is the
  * deterministic proxy `count of [.!?]` in the cleaned text — both
  * engines (and the DuckDB oracle) compute the identical number.
  */
object C4Clean {

  /** Words per line under the oracle-shared definition: maximal \S+
    * runs (an all-whitespace line counts 0, with no empty-split
    * edge case). */
  private def wordCount(line: Column): Column =
    size(regexp_extract_all(line, lit("\\S+"), lit(0)))

  private def lineKept(line: Column, minLineWords: Int): Column = {
    val t = rtrim(line)
    t.rlike("[.!?\"]$") &&
      (wordCount(line) >= minLineWords) &&
      !lower(line).contains("javascript")
  }

  /** The line-cleaned text column: kept lines re-joined with \n. */
  def cleanedText(text: Column, minLineWords: Int = 5): Column =
    array_join(
      filter(split(text, "\n"), l => lineKept(l, minLineWords)), "\n")

  /** Sentence-count proxy shared with the oracle: occurrences of
    * . ! or ? in the (cleaned) text. */
  def sentenceCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.!?]"), lit(0)))

  private def pageDropped(orig: Column, cleaned: Column,
      minSentences: Int, badWords: Seq[String]): Column = {
    val bad = badWords.foldLeft(lit(false)) { (acc, w) =>
      acc || lower(orig).contains(w.toLowerCase)
    }
    (sentenceCount(cleaned) < minSentences) ||
      orig.contains("{") || lower(orig).contains("lorem ipsum") || bad
  }

  /** Clean a corpus: line rules rewrite `text`, page rules gate rows.
    * Output keeps every input column, with `text` replaced by the
    * cleaned text plus bookkeeping counts (`c4_lines_kept`,
    * `c4_lines_dropped`, `c4_sentences`). Map-only. */
  def clean(df: DataFrame, text: String, minLineWords: Int = 5,
      minSentences: Int = 3, badWords: Seq[String] = Nil): DataFrame = {
    val orig = col(text)
    val nLines = size(split(orig, "\n"))
    val cleaned = cleanedText(orig, minLineWords)
    df.withColumn("__c4_clean", cleaned)
      .withColumn("c4_lines_kept", size(split(col("__c4_clean"), "\n")) -
        when(col("__c4_clean") === "", 1).otherwise(0))
      .withColumn("c4_lines_dropped", nLines - col("c4_lines_kept"))
      .withColumn("c4_sentences", sentenceCount(col("__c4_clean")))
      .where(!pageDropped(orig, col("__c4_clean"), minSentences, badWords))
      .withColumn(text, col("__c4_clean"))
      .drop("__c4_clean")
  }

  /** One-row drop-accounting funnel (the gopherFunnel discipline):
    * how many pages each rule would catch (counted INDEPENDENTLY — a
    * page can fail several), plus the sequential survivor count and
    * line totals. */
  def funnel(df: DataFrame, text: String, minLineWords: Int = 5,
      minSentences: Int = 3, badWords: Seq[String] = Nil): DataFrame = {
    val orig = col(text)
    val cleaned = cleanedText(orig, minLineWords)
    val staged = df.select(
      orig.as("__t"),
      cleaned.as("__c"),
      size(split(orig, "\n")).as("__nl"))
    def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    val bad = badWords.foldLeft(lit(false)) { (acc, w) =>
      acc || lower(col("__t")).contains(w.toLowerCase)
    }
    staged.agg(
      count(lit(1)).as("pages"),
      sum(col("__nl")).as("lines"),
      sum(size(split(col("__c"), "\n")) -
        when(col("__c") === "", 1).otherwise(0)).as("lines_kept"),
      cnt(sentenceCount(col("__c")) < minSentences).as("drop_few_sentences"),
      cnt(col("__t").contains("{")).as("drop_brace"),
      cnt(lower(col("__t")).contains("lorem ipsum")).as("drop_lorem"),
      cnt(bad).as("drop_bad_words"),
      cnt(!((sentenceCount(col("__c")) < minSentences) ||
        col("__t").contains("{") || lower(col("__t")).contains("lorem ipsum") ||
        bad)).as("pages_kept"))
  }
}
