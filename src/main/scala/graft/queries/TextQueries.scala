package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis
import Q.t

/** Text-analysis queries: language ID, quality scoring, token
  * counting, fingerprinting (SURVEY north-star training-data ops).
  * All pure-expression — the DuckDB oracles mirror the same formulas.
  */
object TextQueries {

  private val enIn = "('the','a','of','and','to')"
  private val esIn = "('el','la','de','y','que')"
  private val deIn = "('der','die','das','und','zu')"
  private def hits(set: String): String =
    s"len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), w -> w IN $set))"

  /** Shared bigram-LM oracle chain (q96 + q155): train counts on the
    * even-doc_id half, Stupid-Backoff per-pair log-scores for EVERY
    * doc in `sc(doc_id, lp)`. */
  private val bigramLmCte: String =
    """w AS (SELECT doc_id,
      |  list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |              w -> w <> '') AS ws FROM documents),
      |u AS (SELECT doc_id, unnest(ws) AS wd, generate_subscripts(ws, 1) AS i
      |  FROM w WHERE len(ws) >= 2),
      |pairs AS (SELECT a.doc_id, a.wd AS w1, b.wd AS w2
      |  FROM u a JOIN u b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
      |cu AS (SELECT doc_id, wd, i FROM u WHERE doc_id % 2 = 0),
      |cpairs AS (SELECT a.doc_id, a.wd AS w1, b.wd AS w2
      |  FROM cu a JOIN cu b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
      |cbi AS (SELECT w1, w2, count(*) AS bi FROM cpairs GROUP BY w1, w2),
      |cuni AS (SELECT wd, count(*) AS n FROM
      |   (SELECT unnest(ws) AS wd FROM w WHERE doc_id % 2 = 0)
      |  WHERE wd <> '' GROUP BY wd),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt, count(*) AS v FROM cuni),
      |sc AS (SELECT p.doc_id,
      |  CASE WHEN cbi.bi IS NOT NULL THEN ln(CAST(cbi.bi AS DOUBLE) / u1.n)
      |       ELSE ln(CAST(0.4 AS DOUBLE) * (coalesce(u2.n, 0) + 1) / (nt + v)) END AS lp
      | FROM pairs p
      | LEFT JOIN cbi ON cbi.w1 = p.w1 AND cbi.w2 = p.w2
      | LEFT JOIN cuni u1 ON u1.wd = p.w1
      | LEFT JOIN cuni u2 ON u2.wd = p.w2, tot)""".stripMargin

  val qs: Seq[Q] = Seq(

    // ---- language ID by stopword-profile argmax ----
    Q("q21_langid",
      s"""WITH h AS (SELECT doc_id,
         |  len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens,
         |  ${hits(enIn)} AS en_hits, ${hits(esIn)} AS es_hits, ${hits(deIn)} AS de_hits
         | FROM documents)
         |SELECT doc_id, n_tokens, en_hits, es_hits, de_hits,
         | CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits > 0 THEN 'en'
         |      WHEN es_hits >= de_hits AND es_hits > 0 THEN 'es'
         |      WHEN de_hits > 0 THEN 'de' ELSE 'unknown' END AS lang_pred
         |FROM h ORDER BY doc_id""".stripMargin) { (s, d) =>
      val text = col("text")
      val hitCols = TextAnalysis.stopwordProfiles.map { case (l, ws) =>
        TextAnalysis.stopwordHits(text, ws).as(s"${l}_hits")
      }
      t(s, d, "documents")
        .select(Seq(col("doc_id"), TextAnalysis.tokenCount(text).as("n_tokens")) ++
          hitCols :+ TextAnalysis.langId(text).as("lang_pred"): _*)
        .orderBy(col("doc_id"))
    },

    // ---- quality scoring: length/punct/stopword ratios ----
    Q("q22_quality",
      s"""WITH h AS (SELECT doc_id,
         |  len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens,
         |  len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS punct_n,
         |  ${hits(enIn)} AS stop_hits,
         |  length(regexp_replace(text, '\\s', '', 'g')) AS char_nws
         | FROM documents)
         |SELECT doc_id, n_tokens, punct_n, stop_hits, char_nws,
         | round(CAST(stop_hits AS DOUBLE) / n_tokens, 6) AS stop_ratio,
         | round(CAST(char_nws AS DOUBLE) / n_tokens, 6) AS avg_token_len,
         | CASE WHEN n_tokens >= 30 AND stop_hits > 0 THEN 'good'
         |      WHEN n_tokens >= 10 THEN 'fair' ELSE 'poor' END AS quality
         |FROM h ORDER BY doc_id""".stripMargin) { (s, d) =>
      // fused TextStats codegen expression: all four counters in ONE
      // string pass (the composed regexp_extract_all/split variants
      // re-scan the text per stat; equivalence is spec-asserted in
      // TextStatsSpec, and the DuckDB oracle above is unchanged)
      val st = TextAnalysis.textStats(col("text"))
      t(s, d, "documents")
        .select(col("doc_id"), st.as("__st"))
        .select(col("doc_id"),
          col("__st.n_tokens").as("n_tokens"),
          col("__st.punct_n").as("punct_n"),
          col("__st.stop_hits").as("stop_hits"),
          col("__st.char_nws").as("char_nws"),
          round(col("__st.stop_hits").cast("double") / col("__st.n_tokens"), 6)
            .as("stop_ratio"),
          round(col("__st.char_nws").cast("double") / col("__st.n_tokens"), 6)
            .as("avg_token_len"),
          TextAnalysis.qualityBucket(col("__st.n_tokens"), col("__st.stop_hits"))
            .as("quality"))
        .orderBy(col("doc_id"))
    },

    // ---- token counting: whitespace + BPE-ish regex ----
    Q("q23_tokens",
      """SELECT doc_id,
        | len(string_split_regex(lower(trim(text)), '\s+')) AS ws_tokens,
        | len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_tokens,
        | n_chars
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      t(s, d, "documents").select(
          col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("ws_tokens"),
          TextAnalysis.bpeTokenCount(col("text")).as("bpe_tokens"),
          col("n_chars"))
        .orderBy(col("doc_id"))
    },

    // ---- civic-entity extraction (the reference's dormant dspy
    //      signatures as deterministic pattern ops) ----
    Q("q53_civic_extract",
      """WITH c AS (SELECT doc_id,
        |  'The council discussed Ordinance No. ' || CAST((doc_id * 7) % 10000 AS VARCHAR) ||
        |  ' and Docket ' || CAST(doc_id % 100 AS VARCHAR) || '-' || CAST(doc_id % 10 AS VARCHAR) ||
        |  ' at ' || CAST(doc_id % 900 + 100 AS VARCHAR) || ' Canal Street. The mayor said "' ||
        |  substr(text, 1, 40) || '" today.' AS body
        | FROM documents)
        |SELECT doc_id,
        | array_to_string(regexp_extract_all(body, '(?i)ordinance(?:\s+no\.?)?\s+([0-9]+(?:,[0-9]{3})*)', 1), '|||') AS ords,
        | array_to_string(regexp_extract_all(body, '(?i)docket(?:\s+no\.?)?\s+([0-9]+(?:-[0-9]+)*)', 1), '|||') AS dockets,
        | array_to_string(regexp_extract_all(body, '\d+\s+[A-Z][A-Za-z]*(?:\s+[A-Z][A-Za-z]*)*\s+(?:St|Ave|Blvd|Dr|Rd|Street|Avenue|Boulevard|Drive|Road)\b'), '|||') AS addrs,
        | array_to_string(regexp_extract_all(body, '"([^"]{2,200})"', 1), '|||') AS quotes
        |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
      import graft.ops.CivicExtract
      val body = concat(
        lit("The council discussed Ordinance No. "),
        ((col("doc_id") * 7) % 10000).cast("string"),
        lit(" and Docket "), (col("doc_id") % 100).cast("string"),
        lit("-"), (col("doc_id") % 10).cast("string"),
        lit(" at "), (col("doc_id") % 900 + 100).cast("string"),
        lit(" Canal Street. The mayor said \""),
        substring(col("text"), 1, 40), lit("\" today."))
      t(s, d, "documents").withColumn("body", body)
        .select(col("doc_id"),
          array_join(CivicExtract.ordinanceNumbers(col("body")), "|||").as("ords"),
          array_join(CivicExtract.docketNumbers(col("body")), "|||").as("dockets"),
          array_join(CivicExtract.streetAddresses(col("body")), "|||").as("addrs"),
          array_join(CivicExtract.quotedSpans(col("body")), "|||").as("quotes"))
        .orderBy(col("doc_id"))
    },

    // ---- PII scrub: typed placeholder redaction (emails/SSN/phone/IP) ----
    // Synthetic PII is appended per row so the scrub provably fires on
    // every document; patterns are RE2-safe → identical in Java regex
    // and DuckDB. The 'g' flag is required DuckDB-side (Spark
    // regexp_replace is global by default).
    Q("q61_pii_scrub",
      """WITH aug AS (SELECT doc_id,
        |  text || ' contact u' || CAST(doc_id AS VARCHAR) ||
        |  '@example.com or 555-123-4567 ssn 123-45-6789 host 10.0.0.' ||
        |  CAST(doc_id % 256 AS VARCHAR) AS body
        | FROM documents)
        |SELECT doc_id,
        | regexp_replace(regexp_replace(regexp_replace(regexp_replace(body,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
        |   '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
        |   '\b\d{1,3}(\.\d{1,3}){3}\b', '<IP>', 'g') AS clean
        |FROM aug ORDER BY doc_id""".stripMargin) { (s, d) =>
      val body = concat(col("text"),
        lit(" contact u"), col("doc_id").cast("string"),
        lit("@example.com or 555-123-4567 ssn 123-45-6789 host 10.0.0."),
        (col("doc_id") % 256).cast("string"))
      t(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.scrubPii(body).as("clean"))
        .orderBy(col("doc_id"))
    },

    // ---- repetition metrics: duplicate token/bigram fractions ----
    Q("q62_repetition",
      """WITH w AS (SELECT doc_id,
        |  string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |g AS (SELECT doc_id, ws,
        |  CASE WHEN len(ws) >= 2 THEN list_transform(range(1, len(ws)),
        |    i -> ws[i] || ' ' || ws[i+1]) ELSE [] END AS gs FROM w)
        |SELECT doc_id,
        | CASE WHEN len(ws) <= 0 THEN 0.0
        |      ELSE round(1 - len(list_distinct(ws)) / CAST(len(ws) AS DOUBLE), 6)
        | END AS dup_tok_frac,
        | CASE WHEN len(gs) <= 0 THEN 0.0
        |      ELSE round(1 - len(list_distinct(gs)) / CAST(len(gs) AS DOUBLE), 6)
        | END AS dup_bigram_frac
        |FROM g ORDER BY doc_id""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .withColumn("__r", TextAnalysis.repetitionStats(col("text")))
        .select(col("doc_id"),
          round(col("__r.dup_tok_frac"), 6).as("dup_tok_frac"),
          round(col("__r.dup_bigram_frac"), 6).as("dup_bigram_frac"))
        .orderBy(col("doc_id"))
    },

    // ---- sliding token-window chunking (RAG splitter, 32-tok/8 overlap) ----
    Q("q63_chunk_tokens",
      """WITH w AS (SELECT doc_id, list_filter(
        |  string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS ws
        | FROM documents),
        |s AS (SELECT doc_id, ws,
        |  unnest(range(0, greatest(len(ws) - 9, 0) + 1, 24)) AS start
        | FROM w WHERE len(ws) >= 1)
        |SELECT doc_id, CAST(start / 24 AS BIGINT) AS chunk_idx,
        | array_to_string(list_slice(ws, start + 1, least(start + 32, len(ws))), ' ') AS chunk_text,
        | CAST(least(32, len(ws) - start) AS BIGINT) AS n_tokens
        |FROM s ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
      graft.ops.Chunking.chunkByTokens(t(s, d, "documents"), "doc_id",
          col("text"), window = 32, overlap = 8)
        .orderBy(col("doc_id"), col("chunk_idx"))
    },

    // ---- fingerprints: sha16 of normalized text + rolling hash ----
    Q("q24_fingerprint",
      """WITH n AS (SELECT doc_id,
        |  regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm FROM documents)
        |SELECT doc_id, substr(sha256(norm),1,16) AS fp_sha,
        | CASE WHEN length(norm) > 0 THEN
        |  list_reduce(list_transform(string_split(norm, ''), c -> CAST(unicode(c) AS BIGINT)),
        |              (a, b) -> (a * 257 + b) % 1000000007)
        | END AS fp_roll
        |FROM n ORDER BY doc_id""".stripMargin) { (s, d) =>
      import graft.expr.Functions
      t(s, d, "documents").select(
          col("doc_id"),
          TextAnalysis.fingerprintSha(col("text")).as("fp_sha"),
          TextAnalysis.rollingHash(Functions.normText(col("text"))).as("fp_roll"))
        .orderBy(col("doc_id"))
    },

    // ---- line-level boilerplate removal (CCNet-style) ----
    // The corpus is single-line, so the query constructs the crawl
    // shape in-query (same pattern as q14's mutated copies): a header
    // line shared by EVERY doc (boilerplate: doc-frequency 500 >= 10)
    // plus a per-doc unique footer. The operator must strip exactly
    // the header (and any body line that happens to repeat across
    // >= 10 docs — the data decides, the oracle agrees) while
    // preserving line order of what remains.
    Q("q67_boilerplate",
      """WITH doc2 AS (SELECT doc_id,
        |  'city council weekly notice' || chr(10) || text || chr(10)
        |    || 'doc ' || doc_id || ' footer' AS text
        | FROM documents),
        |s AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM doc2),
        |u AS (SELECT doc_id, unnest(ls) AS line,
        |  generate_subscripts(ls, 1) AS pos FROM s),
        |boiler AS (SELECT line FROM u WHERE trim(line) <> ''
        | GROUP BY line HAVING count(DISTINCT doc_id) >= 10),
        |kept AS (SELECT * FROM u WHERE line NOT IN (SELECT line FROM boiler)),
        |reb AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text
        | FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(r.clean_text, '') AS clean_text
        |FROM documents d LEFT JOIN reb r ON r.doc_id = d.doc_id
        |ORDER BY 1""".stripMargin) { (s, d) =>
      val doc2 = t(s, d, "documents").select(col("doc_id"),
        concat(lit("city council weekly notice\n"), col("text"),
          lit("\ndoc "), col("doc_id").cast("string"), lit(" footer")).as("text"))
      TextAnalysis.removeBoilerplateLines(doc2, "doc_id", col("text"),
          minDocs = 10L)
        .orderBy(col("doc_id"))
    },

    // ---- BM25 lexical top-k retrieval ----
    // Query ('dup','vector','hash'): 'dup' is rare (df~25 at sf0.01)
    // so its idf dominates — the ranking is a real relevance signal,
    // not a length artifact. Constants are spelled as the same
    // literals on both sides ((1.2+1.0), CAST .5/.25/.75 AS DOUBLE)
    // so each engine derives bit-identical doubles; scores round to
    // 6dp BEFORE the top-k cut (the q74 tie-break lesson) and ties
    // resolve by doc_id.
    Q("q91_bm25_topk",
      """WITH dl AS (SELECT doc_id,
        |  len(string_split_regex(lower(trim(text)), '\s+')) AS dl FROM documents),
        |tot AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |tok AS (SELECT doc_id,
        |  unnest(string_split_regex(lower(trim(text)), '\s+')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
        | WHERE term IN ('dup','vector','hash') GROUP BY doc_id, term),
        |dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |s AS (SELECT tf.doc_id,
        |  round(SUM(ln(1.0 + (n_docs - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)))
        |    * tf * (CAST(1.2 AS DOUBLE) + 1.0)
        |    / (tf + CAST(1.2 AS DOUBLE)
        |       * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / avgdl))), 6) AS score,
        |  count(*) AS n_terms
        | FROM tf JOIN dfr USING (term) JOIN dl USING (doc_id), tot
        | GROUP BY tf.doc_id)
        |SELECT doc_id, score, n_terms FROM s
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin) { (s, d) =>
      graft.ops.Bm25.bm25TopK(t(s, d, "documents"), "doc_id", col("text"),
        Seq("dup", "vector", "hash"), k = 20)
    },

    // ---- Gopher-style repetition/quality gate ----
    // Rae et al. 2021 Table-A1-spirit per-doc stats: mean word length,
    // alpha-word fraction, most-common word/bigram shares, and the
    // boolean keep gate. Gate inputs are exact-integer ratios in
    // double (rounding is display-only), so keep cannot flip across
    // engines.
    Q("q93_gopher_gate",
      """WITH w AS (SELECT doc_id, list_filter(
        |  string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS ws
        | FROM documents),
        |u AS (SELECT doc_id, unnest(ws) AS wd FROM w),
        |wc AS (SELECT doc_id, wd, count(*) AS c FROM u GROUP BY doc_id, wd),
        |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  sum(length(wd) * c) / CAST(sum(c) AS DOUBLE) AS mwl,
        |  sum(CASE WHEN regexp_matches(wd, '\p{L}') THEN c ELSE 0 END)
        |    / CAST(sum(c) AS DOUBLE) AS fa,
        |  max(c) / CAST(sum(c) AS DOUBLE) AS twf
        | FROM wc GROUP BY doc_id),
        |p AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bg FROM
        |  (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
        |   FROM w WHERE len(ws) >= 2)),
        |pc AS (SELECT doc_id, bg, count(*) AS c FROM p GROUP BY doc_id, bg),
        |bagg AS (SELECT doc_id, max(c) / CAST(sum(c) AS DOUBLE) AS tbf
        | FROM pc GROUP BY doc_id)
        |SELECT a.doc_id, n_tokens,
        | round(mwl, 6) AS mean_word_len,
        | round(fa, 6) AS frac_alpha_words,
        | round(twf, 6) AS top_word_frac,
        | round(coalesce(tbf, 0), 6) AS top_bigram_frac,
        | (mwl BETWEEN 3 AND 10 AND fa >= 0.8 AND twf <= 0.2
        |  AND coalesce(tbf, 0) <= 0.18) AS keep
        |FROM agg a LEFT JOIN bagg b USING (doc_id)
        |ORDER BY a.doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.gopherReport(t(s, d, "documents"), "doc_id", col("text"))
        .orderBy(col("doc_id"))
    },

    // ---- bigram LM scoring with Stupid Backoff ----
    // Train on the even-doc_id half, score EVERY doc: odd docs hit
    // unseen bigrams, exercising the 0.4·add-one backoff branch on
    // real data (a self-trained corpus never backs off). Both engines
    // build pairs from the same token arrays and the same count
    // tables; the only floats are the final ln/avg, rounded to 6dp.
    // Empty tokens are filtered BEFORE pairing on both sides (the op
    // does the same) — see bigramLogProb's scaladoc.
    Q("q96_bigram_lm",
      s"""WITH $bigramLmCte
        |SELECT doc_id, count(*) AS n_pairs, round(avg(lp), 6) + 0.0 AS avg_logprob
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      TextAnalysis.bigramLogProb(docs, docs.filter(col("doc_id") % 2 === 0),
          "doc_id", col("text"))
        .orderBy(col("doc_id"))
    },

    // ---- CCNet perplexity banding over the bigram LM scores ----
    // Same LM as q96 (train even-half, score all); both engines cut
    // the ROUNDED score distribution at the exact 0.3/0.7 quantiles
    // (the q46 percentile/quantile_cont interpolation parity) and
    // label head/middle/tail. CCNet keeps head+middle. The "hi IS
    // NULL" branch is the degenerate-corpus parity pin (r17 ADVICE):
    // quantile_cont/percentile both NULL the cuts when NO doc has a
    // finite score, and the op then bands every row NULL — without
    // the explicit branch the oracle's ELSE would label those rows
    // 'tail' (NULL >= NULL is not true, it falls through). Unreachable
    // on this fixture; pinned so a degenerate one can't flip the hash.
    Q("q155_ccnet_ppx_bands",
      s"""WITH $bigramLmCte,
        |agg AS (SELECT doc_id, count(*) AS n_pairs,
        |    round(avg(lp), 6) + 0.0 AS avg_logprob FROM sc GROUP BY doc_id),
        |cut AS (SELECT round(quantile_cont(avg_logprob, 0.3), 6) AS lo,
        |    round(quantile_cont(avg_logprob, 0.7), 6) AS hi FROM agg)
        |SELECT doc_id, n_pairs, avg_logprob,
        |  CASE WHEN hi IS NULL THEN NULL
        |       WHEN avg_logprob >= hi THEN 'head'
        |       WHEN avg_logprob >= lo THEN 'middle'
        |       ELSE 'tail' END AS band
        |FROM agg, cut ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      TextAnalysis.ppxBands(docs, docs.filter(col("doc_id") % 2 === 0),
          "doc_id", col("text"))
        .orderBy(col("doc_id"))
    },

    // ---- per-doc unigram entropy / perplexity (lexical diversity) ----
    // H = ln n − Σ c·ln c / n, perplexity = e^H ("effective vocab").
    // Template spam repeats a few tokens → low entropy; both engines
    // run the same two-level count tables, floats only in the final
    // ln/exp, rounded to 6dp.
    Q("q99_token_entropy",
      """WITH w AS (SELECT doc_id, unnest(list_filter(
        |  string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS wd
        | FROM documents),
        |c AS (SELECT doc_id, wd, count(*) AS c FROM w GROUP BY doc_id, wd)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        | CAST(count(*) AS BIGINT) AS n_distinct,
        | round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS entropy,
        | round(exp(ln(sum(c)) - sum(c * ln(c)) / sum(c)), 6) AS perplexity
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.tokenEntropy(t(s, d, "documents"), "doc_id", col("text"))
        .orderBy(col("doc_id"))
    },

    // ---- per-doc bigram novelty (contribution score) ----
    // Fraction of the doc's distinct bigrams FIRST seen here (min
    // doc_id over the corpus = "earlier in the ingest stream"). The
    // dedup-aware data-valuation rank: all-seen-before docs score 0.
    Q("q100_novelty",
      """WITH w AS (SELECT doc_id, list_filter(
        |  string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS ws
        | FROM documents),
        |b AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] AS bg FROM
        |  (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
        |   FROM w WHERE len(ws) >= 2)),
        |f AS (SELECT bg, min(doc_id) AS fs FROM b GROUP BY bg)
        |SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        | CAST(sum(CASE WHEN f.fs = b.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        | round(sum(CASE WHEN f.fs = b.doc_id THEN 1 ELSE 0 END)
        |   / CAST(count(*) AS DOUBLE), 6) AS novelty_frac
        |FROM b JOIN f USING (bg) GROUP BY b.doc_id
        |ORDER BY b.doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.noveltyReport(t(s, d, "documents"), "doc_id", col("text"))
        .orderBy(col("doc_id"))
    },

    // ---- Gopher quality-gate funnel (which rule costs the data?) ----
    // One row: population, per-rule independent failure counts, and
    // sequential survivors in rule order. Same raw thresholds as
    // q93's keep, so pass_all = q93's keep count by construction.
    Q("q126_gopher_funnel",
      """WITH w AS (SELECT doc_id, list_filter(
        |  string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS ws
        | FROM documents),
        |u AS (SELECT doc_id, unnest(ws) AS wd FROM w),
        |wc AS (SELECT doc_id, wd, count(*) AS c FROM u GROUP BY doc_id, wd),
        |agg AS (SELECT doc_id,
        |  sum(length(wd) * c) / CAST(sum(c) AS DOUBLE) AS mwl,
        |  sum(CASE WHEN regexp_matches(wd, '\p{L}') THEN c ELSE 0 END)
        |    / CAST(sum(c) AS DOUBLE) AS fa,
        |  max(c) / CAST(sum(c) AS DOUBLE) AS twf
        | FROM wc GROUP BY doc_id),
        |p AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bg FROM
        |  (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
        |   FROM w WHERE len(ws) >= 2)),
        |pc AS (SELECT doc_id, bg, count(*) AS c FROM p GROUP BY doc_id, bg),
        |bagg AS (SELECT doc_id, max(c) / CAST(sum(c) AS DOUBLE) AS tbf
        | FROM pc GROUP BY doc_id),
        |m AS (SELECT a.doc_id, mwl, fa, twf, coalesce(tbf, 0) AS tbf
        | FROM agg a LEFT JOIN bagg b USING (doc_id))
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(CASE WHEN NOT (mwl BETWEEN 3 AND 10) THEN 1 ELSE 0 END)
        |   AS BIGINT) AS fail_word_len,
        | CAST(sum(CASE WHEN NOT (fa >= 0.8) THEN 1 ELSE 0 END) AS BIGINT)
        |   AS fail_alpha,
        | CAST(sum(CASE WHEN NOT (twf <= 0.2) THEN 1 ELSE 0 END) AS BIGINT)
        |   AS fail_top_word,
        | CAST(sum(CASE WHEN NOT (tbf <= 0.18) THEN 1 ELSE 0 END) AS BIGINT)
        |   AS fail_top_bigram,
        | CAST(sum(CASE WHEN mwl BETWEEN 3 AND 10 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS after_word_len,
        | CAST(sum(CASE WHEN mwl BETWEEN 3 AND 10 AND fa >= 0.8
        |   THEN 1 ELSE 0 END) AS BIGINT) AS after_alpha,
        | CAST(sum(CASE WHEN mwl BETWEEN 3 AND 10 AND fa >= 0.8
        |   AND twf <= 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS after_top_word,
        | CAST(sum(CASE WHEN mwl BETWEEN 3 AND 10 AND fa >= 0.8
        |   AND twf <= 0.2 AND tbf <= 0.18 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS pass_all
        |FROM m""".stripMargin) { (s, d) =>
      TextAnalysis.gopherFunnel(t(s, d, "documents"), "doc_id", col("text"))
    },

    // ---- PII scrub (planted emails / IPs / digit runs) ----
    // The synthetic corpus carries no PII, so the query PLANTS
    // deterministic emails (%5), IPv4s (%7) and 16-digit runs (%11) —
    // same construction both engines — then redacts and counts.
    // Counts follow the redaction order (email → IP → digit run) so an
    // email's digits never double-count; both sides use the same
    // RE2-safe pattern text (Redact scaladoc).
    Q("q128_pii_scrub",
      """WITH aug AS (SELECT doc_id, text ||
        |  CASE WHEN doc_id % 5 = 0 THEN ' reach me at user' || doc_id ||
        |    '@mail' || (doc_id % 7) || '.example.com asap' ELSE '' END ||
        |  CASE WHEN doc_id % 7 = 0 THEN ' logged from 10.1.' ||
        |    (doc_id % 200) || '.44 today' ELSE '' END ||
        |  CASE WHEN doc_id % 11 = 0 THEN ' acct 4000123412341234 on file'
        |    ELSE '' END AS text
        | FROM documents),
        |r1 AS (SELECT doc_id, text,
        |  regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |    '<EMAIL>', 'g') AS t1,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT)
        |    AS n_email FROM aug),
        |r2 AS (SELECT doc_id, n_email,
        |  regexp_replace(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
        |    '<IP>', 'g') AS t2,
        |  CAST(len(regexp_extract_all(t1,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ip
        | FROM r1)
        |SELECT doc_id,
        | regexp_replace(t2, '\b\d{13,19}\b', '<ID>', 'g') AS text_redacted,
        | n_email, n_ip,
        | CAST(len(regexp_extract_all(t2, '\b\d{13,19}\b')) AS INT) AS n_id
        |FROM r2 ORDER BY doc_id""".stripMargin) { (s, d) =>
      import graft.ops.Redact
      val aug = t(s, d, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 5 === 0,
            concat(lit(" reach me at user"), col("doc_id"), lit("@mail"),
              col("doc_id") % 7, lit(".example.com asap"))).otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            concat(lit(" logged from 10.1."), col("doc_id") % 200,
              lit(".44 today"))).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            lit(" acct 4000123412341234 on file")).otherwise(lit("")))
          .as("text"))
      val (e, i, dd) = Redact.piiCounts(col("text"))
      aug.select(col("doc_id"),
          Redact.redactPii(col("text")).as("text_redacted"),
          e.as("n_email"), i.as("n_ip"), dd.as("n_id"))
        .orderBy(col("doc_id"))
    },

    // ---- per-source PII scrub report over the same planted corpus ----
    Q("q131_pii_report",
      """WITH aug AS (SELECT doc_id, source, text ||
        |  CASE WHEN doc_id % 5 = 0 THEN ' reach me at user' || doc_id ||
        |    '@mail' || (doc_id % 7) || '.example.com asap' ELSE '' END ||
        |  CASE WHEN doc_id % 7 = 0 THEN ' logged from 10.1.' ||
        |    (doc_id % 200) || '.44 today' ELSE '' END ||
        |  CASE WHEN doc_id % 11 = 0 THEN ' acct 4000123412341234 on file'
        |    ELSE '' END AS text
        | FROM documents),
        |m AS (SELECT doc_id, source,
        |  len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS e,
        |  len(regexp_extract_all(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS i,
        |  len(regexp_extract_all(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{13,19}\b')) AS d
        | FROM aug)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(CASE WHEN e > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_email,
        | CAST(sum(CASE WHEN i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_ip,
        | CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_id,
        | CAST(sum(e) AS BIGINT) AS n_email, CAST(sum(i) AS BIGINT) AS n_ip,
        | CAST(sum(d) AS BIGINT) AS n_id
        |FROM m GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      import graft.ops.Redact
      val aug = t(s, d, "documents").select(col("doc_id"), col("source"),
        concat(col("text"),
          when(col("doc_id") % 5 === 0,
            concat(lit(" reach me at user"), col("doc_id"), lit("@mail"),
              col("doc_id") % 7, lit(".example.com asap"))).otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            concat(lit(" logged from 10.1."), col("doc_id") % 200,
              lit(".44 today"))).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            lit(" acct 4000123412341234 on file")).otherwise(lit("")))
          .as("text"))
      Redact.piiReport(aug, col("source"), col("text"))
        .orderBy(col("source"))
    },

    // ---- per-source encoding-damage report ----
    // Planted damage: %13 docs gain mojibake digraphs (e-acute read as
    // A-tilde+copyright), %23 docs a U+FFFD replacement char. The
    // Spark-side regex spells the digraphs as Java-regex \uXXXX
    // escapes; the SQL below carries the REAL characters (via Scala
    // unicode escapes — RE2 has no \uXXXX), so both engines match the
    // same byte sequences. FFFD counting is regex-free on both sides.
    Q("q135_encoding_damage",
      """WITH aug AS (SELECT doc_id, source, text ||
        |  CASE WHEN doc_id % 13 = 0 THEN ' caf\u00C3\u00A9 d\u00C3\u00A9j\u00C3\u00A0 vu' ELSE '' END ||
        |  CASE WHEN doc_id % 23 = 0 THEN ' bad\uFFFDbyte' ELSE '' END AS text
        | FROM documents),
        |m AS (SELECT source,
        |  CAST(length(text) - length(replace(text, '\uFFFD', '')) AS BIGINT) AS f,
        |  CAST(len(regexp_extract_all(text,
        |    '\u00C3\u00A9|\u00C3\u00A8|\u00C3\u00A4|\u00C3\u00BC|\u00C3\u00B1|\u00E2\u20AC\u2122|\u00E2\u20AC\u0153')) AS BIGINT) AS m
        | FROM aug)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(CASE WHEN f > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_fffd,
        | CAST(sum(CASE WHEN m > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_mojibake,
        | CAST(sum(CASE WHEN f > 0 OR m > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS docs_damaged,
        | CAST(sum(f) AS BIGINT) AS n_fffd, CAST(sum(m) AS BIGINT) AS n_mojibake,
        | round(1.0 - sum(CASE WHEN f > 0 OR m > 0 THEN 1 ELSE 0 END)
        |   / CAST(count(*) AS DOUBLE), 6) AS clean_rate
        |FROM m GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val aug = t(s, d, "documents").select(col("doc_id"), col("source"),
        concat(col("text"),
          when(col("doc_id") % 13 === 0,
            lit(" caf\u00C3\u00A9 d\u00C3\u00A9j\u00C3\u00A0 vu"))
            .otherwise(lit("")),
          when(col("doc_id") % 23 === 0, lit(" bad\uFFFDbyte"))
            .otherwise(lit(""))).as("text"))
      TextAnalysis.encodingDamageReport(aug, col("source"), col("text"))
        .orderBy(col("source"))
    },
  )
}
