package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 lexical retrieval over a document corpus (Robertson/Spärck
  * Jones probabilistic weighting) — the keyword-search half of a
  * training-data / RAG pipeline, next to the embedding ANN ops in
  * `graft.vector`. The reference's relevance gate (newscrawler.py
  * keyword filter) is boolean; BM25 is its ranked generalization.
  *
  * Scale shape: the token explode is filtered to the query terms
  * BEFORE any aggregation, so the tf table holds at most
  * |docs|·|terms| rows; document length is a map-only projection
  * (no explode); document frequency aggregates the tf table
  * (term-cardinality rows, broadcast back); corpus totals broadcast
  * as one row; the final top-k is TakeOrderedAndProject, never a
  * global sort. Pure Column expressions throughout — DuckDB-oracle
  * checkable and codegen'd.
  */
object Bm25 {

  import NearDup.tokens

  /** Top-k documents for `queryTerms` under BM25 (k1, b standard
    * defaults). Scores are rounded to `roundTo` BEFORE ranking so the
    * order reproduces across engines (the q74 tie-break lesson);
    * ties resolve by id. Output: (id, score, n_terms) where n_terms
    * is how many distinct query terms the document matched.
    *
    * Query terms are normalized (trim + lowercase, blanks dropped,
    * duplicates collapsed) to match the lowercased token stream —
    * a caller passing "Dup" or " dup " must not silently score zero
    * rows, and a repeated term must not double-count. */
  def bm25TopK(df: DataFrame, id: String, text: Column,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75, roundTo: Int = 6): DataFrame = {
    // Locale.ROOT: Spark's lower() is locale-independent; a Turkish
    // default locale would otherwise turn "TITLE" into dotless-ı
    // "tıtle" and silently match nothing (the Bench.num discipline)
    val terms = queryTerms.map(_.trim.toLowerCase(java.util.Locale.ROOT))
      .filter(_.nonEmpty).distinct
    require(terms.nonEmpty,
      "bm25TopK: queryTerms must contain at least one non-blank term")
    require(k > 0, "bm25TopK: k must be positive")
    val toks = df.select(col(id), explode(tokens(text)).as("__term"))
      .filter(col("__term").isin(terms: _*))
    val tf = toks.groupBy(col(id), col("__term"))
      .agg(count(lit(1)).as("__tf"))
    val dfreq = tf.groupBy(col("__term"))
      .agg(count(lit(1)).as("__df"))
    val dl = df.select(col(id), TextAnalysis.tokenCount(text).as("__dl"))
    val tot = dl.agg(count(lit(1)).as("__n_docs"), avg(col("__dl")).as("__avgdl"))
    val idf = log(lit(1.0) +
      (col("__n_docs") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5)))
    val norm = col("__tf") + lit(k1) *
      (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))
    val w = idf * col("__tf") * lit(k1 + 1.0) / norm
    tf.join(broadcast(dfreq), "__term")
      .join(dl, id)
      .crossJoin(broadcast(tot))
      .groupBy(col(id))
      .agg(round(sum(w), roundTo).as("score"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col(id))
      .limit(k)
  }
}
