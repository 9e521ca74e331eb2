package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{CorpusDiff, CorpusReports, NearDup}
import Q.t

/** Corpus-governance reports: snapshot diffing for refresh audits,
  * lexical-diversity and Zipf-shape dashboards (synthetic/template
  * source tells), token-length histograms, and the LSH band-planner
  * design curve.
  */
object ReportQueries {

  val qs: Seq[Q] = Seq(

    // ---- snapshot diff summary (corpus refresh audit) ----
    // Old snapshot = doc_id % 7 ≠ 0; new = doc_id % 5 ≠ 0 with every
    // %11 doc edited — a deterministic simulation of a refresh with
    // adds, drops, and in-place edits. Equality is sha16(content):
    // only (id, 16-hex, source) ever reaches the join, never text.
    // The summary is DENSE over the four statuses (columns), so a
    // source with zero changes still reports changed=0.
    Q("q106_snapshot_diff",
      """WITH o AS (SELECT doc_id, substr(sha256(text), 1, 16) AS h, source
        | FROM documents WHERE doc_id % 7 <> 0),
        |n AS (SELECT doc_id, substr(sha256(
        |   CASE WHEN doc_id % 11 = 0 THEN text || ' [edited v2]' ELSE text END
        |  ), 1, 16) AS h, source
        | FROM documents WHERE doc_id % 5 <> 0),
        |d AS (SELECT coalesce(o.source, n.source) AS source,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.h <> n.h THEN 'changed'
        |       ELSE 'unchanged' END AS status
        | FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
        |SELECT source,
        | CAST(sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS added,
        | CAST(sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS removed,
        | CAST(sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS changed,
        | CAST(sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS unchanged
        |FROM d GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val old = docs.filter(col("doc_id") % 7 =!= 0)
      val neu = docs.filter(col("doc_id") % 5 =!= 0)
        .withColumn("text", when(col("doc_id") % 11 === 0,
          concat(col("text"), lit(" [edited v2]"))).otherwise(col("text")))
      CorpusDiff.diffSummary(old, neu, "doc_id", col("text"), col("source"))
        .withColumnRenamed("group", "source")
        .orderBy(col("source"))
    },

    // ---- per-source lexical diversity (type-token ratios) ----
    Q("q107_diversity_report",
      """WITH w AS (SELECT source, list_filter(
        |  string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS ws
        | FROM documents),
        |u AS (SELECT source, unnest(ws) AS t FROM w),
        |ua AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(count(DISTINCT t) AS BIGINT) AS distinct_unigrams
        | FROM u GROUP BY source),
        |p AS (SELECT source, ws[i] || ' ' || ws[i+1] AS bg FROM
        |  (SELECT source, ws, unnest(range(1, len(ws))) AS i
        |   FROM w WHERE len(ws) >= 2)),
        |ba AS (SELECT source, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(count(DISTINCT bg) AS BIGINT) AS distinct_bigrams
        | FROM p GROUP BY source)
        |SELECT ua.source, n_tokens, distinct_unigrams,
        | round(distinct_unigrams / CAST(n_tokens AS DOUBLE), 6) AS unigram_ttr,
        | coalesce(n_bigrams, 0) AS n_bigrams,
        | coalesce(distinct_bigrams, 0) AS distinct_bigrams,
        | round(coalesce(distinct_bigrams / CAST(n_bigrams AS DOUBLE), 0), 6) AS bigram_ttr
        |FROM ua LEFT JOIN ba USING (source) ORDER BY ua.source""".stripMargin) { (s, d) =>
      CorpusReports.diversityReport(t(s, d, "documents"),
          col("source"), col("text"))
        .orderBy(col("source"))
    },

    // ---- per-source Zipf rank-frequency slope ----
    Q("q108_zipf_slope",
      """WITH u AS (SELECT source, unnest(list_filter(
        |  string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS t
        | FROM documents),
        |wc AS (SELECT source, t, count(*) AS c FROM u GROUP BY source, t),
        |r AS (SELECT source, c,
        |  row_number() OVER (PARTITION BY source ORDER BY c DESC, t) AS rn
        | FROM wc),
        |f AS (SELECT source, ln(CAST(rn AS DOUBLE)) AS x,
        |  ln(CAST(c AS DOUBLE)) AS y FROM r WHERE rn <= 100)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_ranks,
        | round(regr_slope(y, x), 6) + 0.0 AS zipf_slope,
        | round(regr_intercept(y, x), 6) AS zipf_intercept
        |FROM f GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      CorpusReports.zipfReport(t(s, d, "documents"),
          col("source"), col("text"), topRanks = 100)
        .orderBy(col("source"))
    },

    // ---- per-source token-length histogram (power-of-two buckets) ----
    Q("q109_token_histogram",
      """WITH n AS (SELECT source, len(list_filter(
        |  string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS nt
        | FROM documents)
        |SELECT source,
        | CAST(CASE WHEN nt <= 0 THEN 0 ELSE length(bin(nt)) END AS INTEGER) AS bucket,
        | CAST(count(*) AS BIGINT) AS n_docs
        |FROM n GROUP BY source, bucket ORDER BY source, bucket""".stripMargin) { (s, d) =>
      CorpusReports.tokenLengthHistogram(t(s, d, "documents"),
          col("source"), col("text"))
        .select(col("source"), col("bucket").cast("int").as("bucket"),
          col("n_docs"))
        .orderBy(col("source"), col("bucket"))
    },

    // ---- pairwise source vocabulary overlap (mirror tell) ----
    Q("q113_vocab_overlap",
      """WITH u AS (SELECT source, unnest(list_filter(
        |  string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS t
        | FROM documents),
        |wc AS (SELECT source, t, count(*) AS c FROM u GROUP BY source, t),
        |v AS (SELECT source, t FROM (SELECT source, t,
        |  row_number() OVER (PARTITION BY source ORDER BY c DESC, t) AS rn
        | FROM wc) WHERE rn <= 200),
        |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY source),
        |i AS (SELECT a.source AS source_a, b.source AS source_b,
        |  CAST(count(*) AS BIGINT) AS ov
        | FROM v a JOIN v b ON a.t = b.t AND a.source < b.source GROUP BY 1, 2),
        |p AS (SELECT sa.source AS source_a, sb.source AS source_b,
        |  sa.n AS na, sb.n AS nb
        | FROM sz sa JOIN sz sb ON sa.source < sb.source)
        |SELECT p.source_a AS source_a, p.source_b AS source_b,
        | coalesce(ov, 0) AS overlap,
        | round(coalesce(ov, 0) / CAST(na + nb - coalesce(ov, 0) AS DOUBLE), 6)
        |   AS jaccard
        |FROM p LEFT JOIN i ON i.source_a = p.source_a AND i.source_b = p.source_b
        |ORDER BY p.source_a, p.source_b""".stripMargin) { (s, d) =>
      CorpusReports.sourceVocabOverlap(t(s, d, "documents"),
          col("source"), col("text"), topV = 200)
        .orderBy(col("source_a"), col("source_b"))
    },

    // ---- corpus-wide top repeated trigram phrases ----
    Q("q115_top_phrases",
      """WITH w AS (SELECT list_filter(
        |  string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS ws
        | FROM documents),
        |g AS (SELECT ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS phrase
        | FROM (SELECT ws, unnest(range(1, len(ws) - 1)) AS i
        |       FROM w WHERE len(ws) >= 3))
        |SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences
        |FROM g GROUP BY phrase
        |ORDER BY n_occurrences DESC, phrase LIMIT 50""".stripMargin) { (s, d) =>
      CorpusReports.topPhrases(t(s, d, "documents"), col("text"), n = 3, k = 50)
    },

    // ---- LSH band-planner curve (pure design arithmetic) ----
    Q("q110_lsh_tuning",
      """WITH f AS (SELECT CAST(b AS INTEGER) AS bands,
        |  CAST(16 // b AS INTEGER) AS rows_per_band
        | FROM (SELECT unnest(range(1, 17)) AS b) WHERE 16 % b = 0),
        |g AS (SELECT i / 20.0 AS jaccard
        | FROM (SELECT unnest(range(1, 20)) AS i))
        |SELECT bands, rows_per_band, jaccard,
        | round(1 - power(1 - power(jaccard, rows_per_band), bands), 6) AS p_candidate,
        | round(power(1.0 / bands, 1.0 / rows_per_band), 6) AS threshold
        |FROM f, g ORDER BY bands, jaccard""".stripMargin) { (s, d) =>
      NearDup.lshTuningCurve(s, numHashes = 16)
        .orderBy(col("bands"), col("jaccard"))
    },

    // ---- truncation-loss curve (context-length pricing) ----
    // For each candidate max sequence length: docs that fit whole and
    // the corpus-token fraction surviving truncation — the table read
    // before fixing a context length (packing slack is q60's side of
    // the trade). Map-side token count + tiny constant explode; no
    // join, no window.
    Q("q120_truncation_loss",
      """WITH n AS (SELECT len(list_filter(
        |  string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS nt
        | FROM documents),
        |l AS (SELECT unnest([64, 128, 256, 512]) AS max_len)
        |SELECT CAST(max_len AS BIGINT) AS max_len,
        | CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(CASE WHEN nt <= max_len THEN 1 ELSE 0 END) AS BIGINT)
        |   AS docs_fit,
        | round(sum(CASE WHEN nt <= max_len THEN 1 ELSE 0 END)
        |       / CAST(count(*) AS DOUBLE), 6) AS frac_docs_fit,
        | CAST(sum(nt) AS BIGINT) AS tokens_total,
        | CAST(sum(least(nt, max_len)) AS BIGINT) AS tokens_kept,
        | round(sum(least(nt, max_len)) / CAST(sum(nt) AS DOUBLE), 6)
        |   AS frac_tokens_kept
        |FROM n, l GROUP BY max_len ORDER BY max_len""".stripMargin) { (s, d) =>
      CorpusReports.truncationLossReport(t(s, d, "documents"), col("text"),
          lens = Seq(64, 128, 256, 512))
        .orderBy(col("max_len"))
    },

    // ---- per-source hapax legomenon rate (vocabulary tail health) ----
    // Fraction of vocab (and of tokens) occurring exactly once —
    // templated text collapses it, OCR/garbage inflates it; sharper
    // than TTR, which the Zipf head dominates.
    Q("q124_hapax_rate",
      """WITH w AS (SELECT source, unnest(list_filter(
        |  string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS t
        | FROM documents),
        |c AS (SELECT source, t, count(*) AS c FROM w GROUP BY source, t),
        |a AS (SELECT source, CAST(count(*) AS BIGINT) AS vocab,
        |  CAST(sum(c) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
        | FROM c GROUP BY source)
        |SELECT source, vocab, n_tokens, hapax,
        | round(hapax / CAST(vocab AS DOUBLE), 6) AS hapax_vocab_share,
        | round(hapax / CAST(n_tokens AS DOUBLE), 6) AS hapax_token_share
        |FROM a ORDER BY source""".stripMargin) { (s, d) =>
      CorpusReports.hapaxReport(t(s, d, "documents"), col("source"),
          col("text"))
        .orderBy(col("source"))
    },

    // ---- exact per-source token-length percentiles ----
    // Both engines use the same nearest-rank definition spelled out as
    // a cumsum over (source, len) counts, so parity is by construction
    // (DuckDB's quantile_disc interpolates rank differently).
    Q("q127_length_percentiles",
      """WITH lens AS (SELECT source, len(list_filter(
        |  string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS token_len
        | FROM documents),
        |c AS (SELECT source, token_len, count(*) AS c FROM lens GROUP BY 1, 2),
        |cum AS (SELECT source, token_len, c,
        |  SUM(c) OVER (PARTITION BY source ORDER BY token_len) AS cum FROM c),
        |tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs FROM c GROUP BY 1),
        |p AS (SELECT * FROM (VALUES (0.5, 'p50'), (0.9, 'p90'), (0.99, 'p99'))
        |  AS t(q, pct))
        |SELECT cum.source, p.pct, tot.n_docs,
        | CAST(cum.token_len AS BIGINT) AS token_len
        |FROM cum JOIN tot USING (source) CROSS JOIN p
        |WHERE cum.cum >= ceil(p.q * tot.n_docs)
        |  AND cum.cum - cum.c < ceil(p.q * tot.n_docs)
        |ORDER BY source, pct""".stripMargin) { (s, d) =>
      CorpusReports.lengthPercentilesReport(t(s, d, "documents"),
          col("source"), col("text"))
        .orderBy(col("source"), col("pct"))
    },

    // ---- exact Heaps-law vocabulary-growth curve ----
    // Distinct vocabulary after each 1/20 of the token stream (docs
    // laid end to end in id order). Both engines bucket each word's
    // FIRST global position with the same integer arithmetic, so the
    // curve is exact — no per-checkpoint rescan on either side.
    Q("q132_heaps_curve",
      """WITH w AS (SELECT doc_id, list_filter(
        |  string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS ws
        | FROM documents),
        |n AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n FROM w),
        |pr AS (SELECT doc_id, ws, SUM(n) OVER (ORDER BY doc_id) - n AS pre
        | FROM n),
        |pos AS (SELECT ws[i] AS wd, pre + i - 1 AS p
        | FROM (SELECT ws, pre, unnest(range(1, len(ws) + 1)) AS i FROM pr)),
        |f AS (SELECT wd, MIN(p) AS fp FROM pos GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS N FROM n),
        |b AS (SELECT (fp * 20) // N AS b, CAST(count(*) AS BIGINT) AS cnt
        | FROM f CROSS JOIN t GROUP BY 1),
        |k AS (SELECT unnest(range(1, 21)) AS checkpoint)
        |SELECT k.checkpoint,
        | (t.N * k.checkpoint + 19) // 20 AS tokens_seen,
        | CAST(coalesce(SUM(b.cnt), 0) AS BIGINT) AS vocab
        |FROM k CROSS JOIN t LEFT JOIN b ON b.b < k.checkpoint
        |GROUP BY k.checkpoint, t.N ORDER BY k.checkpoint""".stripMargin) {
      (s, d) =>
      CorpusReports.heapsCurve(t(s, d, "documents"), "doc_id", col("text"))
        .orderBy(col("checkpoint"))
    },
  )
}
