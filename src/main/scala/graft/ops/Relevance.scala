package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** P8 — keyword-relevance filter (ref newscrawler.py:301-311): keep a
  * row when ANY vocabulary keyword is a substring of the lowercased
  * text. The vocabulary is a small constant (40 keywords in the
  * reference) so it folds into the codegen'd predicate — no join, no
  * shuffle; at 100 TB this runs inside the parquet scan stage.
  */
object Relevance {

  /** Reference vocabulary analog (ref newscrawler.py:48-57). */
  val defaultKeywords: Seq[String] =
    Seq("council", "ordinance", "budget", "zoning", "mayor")

  def anyKeyword(text: Column, keywords: Seq[String]): Column = {
    require(keywords.nonEmpty, "empty keyword vocabulary")
    val blob = lower(text)
    // keyword constants lower via the SQL path too (locale-immune)
    keywords.map(k => blob.contains(
      org.apache.spark.unsafe.types.UTF8String.fromString(k)
        .toLowerCase.toString)).reduce(_ || _)
  }
}
