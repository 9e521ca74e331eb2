package graft.queries

import org.apache.spark.sql.functions._
import graft.expr.Functions._
import Q.t

/** Scalar-function coverage (SURVEY §2.8): URL/regex scalars F1-F7,
  * time scalars F12/F13/F15, id scalars F16/F19 — each driven through
  * synthesized columns over the testdata so the DuckDB oracle checks
  * exact string/number parity.
  */
object ScalarQueries {

  val qs: Seq[Q] = Seq(

    // ---- F1/F3-F7: regex extraction, protocol fixup, link classify,
    //      extension rewrite, basename, shared-link rewrite ----
    Q("q25_scalar_urls",
      """WITH u AS (SELECT doc_id,
        |  '//cdn.example/' || source || '/' || CAST(doc_id AS VARCHAR) || '.mp4' AS url,
        |  'https://box.example/s/' || substr(sha256(text),1,8) AS box,
        |  CASE WHEN doc_id % 7 = 0 THEN 'TBD'
        |       ELSE 'Wednesday, March ' || CAST(doc_id % 28 + 1 AS VARCHAR) || ', 2026 - 10:30 AM' END AS header
        | FROM documents)
        |SELECT doc_id,
        | CASE WHEN url LIKE '//%' THEN 'https:' || url ELSE url END AS fixed_url,
        | CASE WHEN url LIKE '%.mp4%' THEN 'video'
        |      WHEN url LIKE '%AgendaViewer.php%' THEN 'agenda'
        |      WHEN url LIKE '%MinutesViewer.php%' THEN 'minutes'
        |      ELSE 'other' END AS kind,
        | regexp_replace(url, '\.mp4$', '.txt') AS txt_name,
        | regexp_extract(url, '([^/]+)$', 1) AS base_name,
        | regexp_replace(box, '/s/', '/shared/static/') || '.mp4?dl=1' AS shared_url,
        | CASE WHEN regexp_extract(header, '(\w+,\s\w+\s\d{1,2},\s\d{4})\s*-\s*(\d{1,2}:\d{2}\s*[APMapm]{2})', 1) = ''
        |      THEN header
        |      ELSE regexp_extract(header, '(\w+,\s\w+\s\d{1,2},\s\d{4})\s*-\s*(\d{1,2}:\d{2}\s*[APMapm]{2})', 1) END AS mdate,
        | CASE WHEN regexp_extract(header, '(\w+,\s\w+\s\d{1,2},\s\d{4})\s*-\s*(\d{1,2}:\d{2}\s*[APMapm]{2})', 2) = ''
        |      THEN 'Unknown Time'
        |      ELSE regexp_extract(header, '(\w+,\s\w+\s\d{1,2},\s\d{4})\s*-\s*(\d{1,2}:\d{2}\s*[APMapm]{2})', 2) END AS mtime
        |FROM u ORDER BY doc_id""".stripMargin) { (s, d) =>
      val base = t(s, d, "documents").select(col("doc_id"),
        concat(lit("//cdn.example/"), col("source"), lit("/"),
          col("doc_id").cast("string"), lit(".mp4")).as("url"),
        concat(lit("https://box.example/s/"),
          substring(sha2(col("text"), 256), 1, 8)).as("box"),
        when(col("doc_id") % 7 === 0, lit("TBD"))
          .otherwise(concat(lit("Wednesday, March "),
            (col("doc_id") % 28 + 1).cast("string"), lit(", 2026 - 10:30 AM")))
          .as("header"))
      base.select(col("doc_id"),
          fixProtocolRelative(col("url")).as("fixed_url"),
          linkKind(col("url")).as("kind"),
          rewriteExt(col("url"), ".mp4", ".txt").as("txt_name"),
          basename(col("url")).as("base_name"),
          sharedLink(col("box")).as("shared_url"),
          extractMeetingDate(col("header")).as("mdate"),
          extractMeetingTime(col("header")).as("mtime"))
        .orderBy(col("doc_id"))
    },

    // ---- F13/F15: timestamp → unix seconds, date formatting ----
    Q("q26_time_scalars",
      """SELECT o_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS o_unix,
        | strftime(o_orderdate, '%Y-%m-%d') AS o_day
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      t(s, d, "orders").select(col("o_orderkey"),
          toUnix(col("o_orderdate")).as("o_unix"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_day"))
        .orderBy(col("o_orderkey"))
    },

    // ---- F12/F16/F19: RFC-2822 parse, id concat, id coalesce ----
    Q("q27_rfc2822",
      """WITH e AS (SELECT event_id, user_id,
        |  'Tue, 06 Aug 2024 12:34:' || lpad(CAST(event_id % 60 AS VARCHAR), 2, '0') || ' +0000' AS published
        | FROM events)
        |SELECT event_id, published,
        | CAST(epoch(strptime(published, '%a, %d %b %Y %H:%M:%S %z')) AS BIGINT) AS pub_unix,
        | substr(published, 1, 10) AS pub_prefix,
        | 'ev:' || CAST(user_id AS VARCHAR) || ':' || CAST(event_id AS VARCHAR) AS doc_key,
        | coalesce(CASE WHEN event_id % 5 <> 0 THEN 'id:' || CAST(event_id AS VARCHAR) END,
        |          'article_' || CAST(event_id AS VARCHAR)) AS art_id
        |FROM e ORDER BY event_id""".stripMargin) { (s, d) =>
      val e = t(s, d, "events").select(col("event_id"), col("user_id"),
        concat(lit("Tue, 06 Aug 2024 12:34:"),
          lpad((col("event_id") % 60).cast("string"), 2, "0"),
          lit(" +0000")).as("published"))
      e.select(col("event_id"), col("published"),
          rfc2822ToUnix(col("published")).as("pub_unix"),
          substring(col("published"), 1, 10).as("pub_prefix"),
          idConcat(lit("ev"), col("user_id"), col("event_id")).as("doc_key"),
          coalesce(
            when(col("event_id") % 5 =!= 0,
              concat(lit("id:"), col("event_id").cast("string"))),
            concat(lit("article_"), col("event_id").cast("string"))).as("art_id"))
        .orderBy(col("event_id"))
    },
  )
}
