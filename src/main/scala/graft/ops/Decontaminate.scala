package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag (or drop)
  * training documents that share any word n-gram with an evaluation/
  * benchmark set — the standard guard against test-set leakage into
  * pretraining data.
  *
  * Scale shape: both sides explode to distinct (doc, shingle) rows and
  * meet in an equi-join on the shingle — one shuffle, no pairwise
  * comparison. The benchmark side is typically tiny relative to the
  * corpus (eval suites, not corpora): broadcast it with
  * `broadcast(benchmark)` at the call site and the corpus-side shuffle
  * disappears entirely. For very long n-grams, swap the raw shingle
  * string for `xxhash64(shingle)` to shrink the join key — string
  * keys are kept here for cross-engine oracle parity.
  */
object Decontaminate {

  /** Distinct (id, shingle) pairs of word `n`-grams. */
  private def shingleSet(df: DataFrame, id: String, text: Column,
      n: Int): DataFrame =
    df.select(col(id), NearDup.tokens(text).as("__w"))
      .filter(size(col("__w")) >= n)
      .select(col(id),
        explode(NearDup.shinglesFromTokens(col("__w"), n)).as("__sh"))
      .distinct()

  /** Per-document contamination report: corpus docs sharing ≥1 word
    * n-gram with the benchmark set, with the count of distinct shared
    * shingles (triage signal: 1 shared 3-gram is noise, 50 is a leak).
    * Output: `(id, n_shared)`; clean documents are absent. */
  def contaminationReport(corpus: DataFrame, id: String, text: Column,
      benchmark: DataFrame, benchText: Column, n: Int = 3): DataFrame = {
    val corpusShingles = shingleSet(corpus, id, text, n)
    val benchShingles = benchmark
      .select(NearDup.tokens(benchText).as("__w"))
      .filter(size(col("__w")) >= n)
      .select(explode(NearDup.shinglesFromTokens(col("__w"), n)).as("__sh"))
      .distinct()
    corpusShingles
      .join(benchShingles, "__sh") // equi-join on the shingle, one shuffle
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Drop contaminated documents outright (anti join on the report).
    * `minShared` tunes aggressiveness: 1 = drop on any overlap. */
  def decontaminate(corpus: DataFrame, id: String, text: Column,
      benchmark: DataFrame, benchText: Column, n: Int = 3,
      minShared: Long = 1L): DataFrame = {
    val flagged = contaminationReport(corpus, id, text, benchmark, benchText, n)
      .filter(col("n_shared") >= minShared)
      .select(col(id))
    corpus.join(flagged, Seq(id), "left_anti")
  }
}
