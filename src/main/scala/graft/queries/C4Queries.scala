package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.C4Clean
import Q.t

/** C4 cleaning-pass queries (ops/C4Clean.scala). The synthetic
  * documents fixture has no natural line structure or punctuation —
  * raw C4 rules drop every page — so q154 PLANTS deterministic
  * structure in-query (the q112 planted-truncations discipline):
  * both engines apply the identical regexp_replace, so the hash still
  * checks every line and page rule end-to-end on ~210 surviving
  * pages. q153's funnel needs no planting: its one-row accounting is
  * exact on any input (here: every page fails the sentence gate).
  */
object C4Queries {

  /** Shared DuckDB CTE: line-filter + rejoin under the oracle-shared
    * definitions (words = \S+ runs; sentence proxy = [.!?] count).
    * Expects a `base(doc_id, text)` CTE upstream. */
  private val cleanCte: String =
    """cl AS (SELECT doc_id, text,
      |  list_filter(string_split(text, chr(10)), l ->
      |    regexp_matches(rtrim(l), '[.!?"]$')
      |    AND len(regexp_extract_all(l, '\S+')) >= 5
      |    AND NOT contains(lower(l), 'javascript')) AS kept
      | FROM base),
      |c2 AS (SELECT doc_id, text,
      |   -- DuckDB's array_to_string of an EMPTY list is NULL; Spark's
      |   -- array_join is '' — coalesce so the sentence proxy reads 0
      |   COALESCE(array_to_string(kept, chr(10)), '') AS ctext,
      |   len(kept) AS kn,
      |   len(string_split(text, chr(10))) AS nl FROM cl),
      |f AS (SELECT doc_id, text, ctext, kn, nl,
      |   len(regexp_extract_all(ctext, '[.!?]')) AS ns FROM c2)""".stripMargin

  val qs: Seq[Q] = Seq(

    // ---- the drop-accounting funnel over the raw corpus ----
    Q("q153_c4_funnel",
      s"""WITH base AS (SELECT doc_id, COALESCE(text, '') AS text
         |  FROM documents),
         |$cleanCte
         |SELECT CAST(count(*) AS BIGINT) AS pages,
         |  CAST(SUM(nl) AS BIGINT) AS lines,
         |  CAST(SUM(kn) AS BIGINT) AS lines_kept,
         |  CAST(SUM(CASE WHEN ns < 3 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS drop_few_sentences,
         |  CAST(SUM(CASE WHEN contains(text, '{') THEN 1 ELSE 0 END) AS BIGINT)
         |    AS drop_brace,
         |  CAST(SUM(CASE WHEN contains(lower(text), 'lorem ipsum')
         |    THEN 1 ELSE 0 END) AS BIGINT) AS drop_lorem,
         |  CAST(0 AS BIGINT) AS drop_bad_words,
         |  CAST(SUM(CASE WHEN NOT (ns < 3 OR contains(text, '{')
         |    OR contains(lower(text), 'lorem ipsum')) THEN 1 ELSE 0 END)
         |    AS BIGINT) AS pages_kept
         |FROM f""".stripMargin) { (s, d) =>
      C4Clean.funnel(t(s, d, "documents"), "text")
    },

    // ---- the cleaning pass itself, over planted line structure ----
    Q("q154_c4_clean",
      s"""WITH base AS (SELECT doc_id,
         |    regexp_replace(COALESCE(text, ''), ' (line|row) ',
         |      '.' || chr(10), 'g') AS text
         |  FROM documents),
         |$cleanCte
         |SELECT doc_id, sha256(ctext) AS digest,
         |  CAST(kn AS BIGINT) AS c4_lines_kept,
         |  CAST(nl - kn AS BIGINT) AS c4_lines_dropped,
         |  CAST(ns AS BIGINT) AS c4_sentences
         |FROM f
         |WHERE NOT (ns < 3 OR contains(text, '{')
         |  OR contains(lower(text), 'lorem ipsum'))
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val planted = t(s, d, "documents")
        .withColumn("text", regexp_replace(col("text"), " (line|row) ", ".\n"))
      C4Clean.clean(planted, "text")
        .select(col("doc_id"),
          sha2(col("text"), 256).as("digest"),
          col("c4_lines_kept").cast("long").as("c4_lines_kept"),
          col("c4_lines_dropped").cast("long").as("c4_lines_dropped"),
          col("c4_sentences").cast("long").as("c4_sentences"))
    }
  )
}
