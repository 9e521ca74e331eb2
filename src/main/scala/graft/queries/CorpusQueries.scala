package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{SourceMix, TextAnalysis, TextClassifier}
import Q.t

/** Corpus-mix and vocabulary queries (training-data pipeline surface):
  * per-source statistics, domain-level quality gating, deterministic
  * weighted resampling, per-doc TF-IDF salient terms, Unicode NFC
  * normalization, and head-vocabulary coverage.
  */
object CorpusQueries {

  val qs: Seq[Q] = Seq(

    // ---- per-source corpus report (counts, mean length, share) ----
    Q("q71_source_stats",
      """WITH s AS (SELECT source, count(*) AS n_docs, avg(n_chars) AS am
        | FROM documents GROUP BY source),
        |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS tot FROM s)
        |SELECT source, n_docs, round(am, 4) AS avg_metric,
        | round(n_docs / tot, 6) AS share
        |FROM s, t ORDER BY source""".stripMargin) { (s, d) =>
      SourceMix.sourceStats(t(s, d, "documents"), col("source"), col("n_chars"))
        .orderBy(col("source"))
    },

    // ---- temperature-scaled source mix (exponentiated smoothing) ----
    // q_s ∝ p_s^0.3, the mBERT/XLM up-sampling rule for small
    // high-value sources; `weight` is the multiplier resampleByWeight
    // (q73) consumes. Identity n_s^a / Σ n^a avoids a second pass;
    // both engines run the same IEEE pow/round, 6dp.
    Q("q117_temperature_mix",
      """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        | FROM documents GROUP BY source),
        |t AS (SELECT sum(n_docs) AS nn,
        |  sum(power(CAST(n_docs AS DOUBLE), 0.3)) AS s FROM c)
        |SELECT source, n_docs,
        | round(n_docs / CAST(nn AS DOUBLE), 6) AS p_natural,
        | round(power(CAST(n_docs AS DOUBLE), 0.3) / s, 6) AS q_scaled,
        | round((power(CAST(n_docs AS DOUBLE), 0.3) / s)
        |        / (n_docs / CAST(nn AS DOUBLE)), 6) AS weight,
        | round(power(CAST(n_docs AS DOUBLE), 0.3) / s * nn, 6) AS expected_docs
        |FROM c, t ORDER BY source""".stripMargin) { (s, d) =>
      SourceMix.temperatureWeights(t(s, d, "documents"), col("source"),
          alpha = 0.3)
        .orderBy(col("source"))
    },

    // ---- domain-level quality gate (drop whole sources) ----
    // Keep documents whose SOURCE has >= 10 docs and mean n_chars >=
    // 295 — the RefinedWeb/C4-style "bad domain" pass. The aggregate
    // is integer-exact (sum/count), so the gate reproduces across
    // engines with no float-boundary risk.
    Q("q72_source_filter",
      """WITH ok AS (SELECT source FROM documents
        | GROUP BY source HAVING count(*) >= 10 AND avg(n_chars) >= 295.0)
        |SELECT d.doc_id, d.source FROM documents d JOIN ok USING (source)
        |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      SourceMix.filterBySourceQuality(t(s, d, "documents"), "source",
          col("n_chars"), minDocs = 10L, minAvgMetric = 295.0)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    },

    // ---- deterministic weighted resampling to a target mix ----
    // Source weight = 0.25·(1 + src# mod 8) ∈ [0.25, 2.0]: whole part
    // replicates every doc, fractional part keeps a stable sha256-
    // chosen subset — the DoReMi-style mixing step. All quantities
    // (quarter weights, ×65536 cuts) are exactly representable, so
    // the emitted multiset is engine-reproducible.
    Q("q73_weighted_resample",
      """WITH base AS (SELECT doc_id, source,
        |  CAST(0.25 AS DOUBLE) * (1 + (CAST(substr(source, 4) AS INT) % 8)) AS wt,
        |  (strpos('0123456789abcdef', substr(sha256(CAST(doc_id AS VARCHAR) || ':resample'),1,1)) - 1) * 4096
        |+ (strpos('0123456789abcdef', substr(sha256(CAST(doc_id AS VARCHAR) || ':resample'),2,1)) - 1) * 256
        |+ (strpos('0123456789abcdef', substr(sha256(CAST(doc_id AS VARCHAR) || ':resample'),3,1)) - 1) * 16
        |+ (strpos('0123456789abcdef', substr(sha256(CAST(doc_id AS VARCHAR) || ':resample'),4,1)) - 1) AS bucket
        | FROM documents),
        |n AS (SELECT doc_id, source,
        |  CAST(floor(wt) AS BIGINT)
        |  + CASE WHEN bucket < CAST(floor((wt - floor(wt)) * 65536) AS BIGINT)
        |         THEN 1 ELSE 0 END AS nc
        | FROM base)
        |SELECT doc_id, source, unnest(range(0, nc)) AS copy
        |FROM n WHERE nc > 0 ORDER BY doc_id, copy""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents").select(col("doc_id"), col("source"))
      val wt = lit(0.25) * (lit(1) + substring(col("source"), 4, 8).cast("int") % 8)
      SourceMix.resampleByWeight(docs, col("doc_id"), wt)
        .orderBy(col("doc_id"), col("copy"))
    },

    // ---- per-document top-3 TF-IDF terms ----
    // Ranking uses the ROUNDED score then the term: mathematically
    // equal scores (tf·ln((N/d)^1) = 2·tf·ln(sqrt(N/d)) shapes) must
    // not tie-break differently across engines' last-ulp ln.
    Q("q74_tfidf_terms",
      """WITH tok AS (SELECT doc_id,
        |  unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        | FROM documents),
        |tok2 AS (SELECT doc_id, term FROM tok WHERE term <> ''),
        |nn AS (SELECT count(DISTINCT doc_id) AS n FROM tok2),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok2 GROUP BY 1, 2),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |sc AS (SELECT doc_id, tf.term, round(tf * ln(n / df), 6) AS score
        | FROM tf JOIN dfq USING (term), nn),
        |r AS (SELECT doc_id, term, score,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
        | FROM sc)
        |SELECT doc_id, CAST(rank AS INTEGER) AS rank, term, score
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin) { (s, d) =>
      TextAnalysis.tfidfTopTerms(t(s, d, "documents"), "doc_id", col("text"), k = 3)
        .orderBy(col("doc_id"), col("rank"))
    },

    // ---- Unicode NFC normalization (native codegen expression) ----
    // Every 10th doc gets a decomposed grapheme ("e" + U+0301)
    // appended in-query; the normalizer must compose it (length
    // shrinks by 1) and pass already-normalized text through
    // unchanged. DuckDB's nfc_normalize is the cross-engine oracle.
    Q("q75_nfc_normalize",
      """WITH d2 AS (SELECT doc_id,
        |  CASE WHEN doc_id % 10 = 0 THEN text || ' cafe' || chr(769)
        |       ELSE text END AS t
        | FROM documents)
        |SELECT doc_id, CAST(length(t) AS BIGINT) AS n_in,
        |  nfc_normalize(t) AS norm_text,
        |  CAST(length(nfc_normalize(t)) AS BIGINT) AS n_out
        |FROM d2 ORDER BY doc_id""".stripMargin) { (s, d) =>
      val t2 = when(col("doc_id") % 10 === 0,
        concat(col("text"), lit(" café"))).otherwise(col("text"))
      t(s, d, "documents").select(col("doc_id"),
          length(t2).cast("long").as("n_in"),
          TextAnalysis.nfcNormalize(t2).as("norm_text"),
          length(TextAnalysis.nfcNormalize(t2)).cast("long").as("n_out"))
        .orderBy(col("doc_id"))
    },

    // ---- per-source length-band outlier trim ----
    // Keep each source's docs between its own 5th and 95th length
    // percentiles — distributional outlier removal without a global
    // cutoff. percent_rank = (rank-1)/(n-1): exact integer arithmetic,
    // band membership reproduces across engines; ties move together.
    Q("q78_length_band",
      """SELECT doc_id, source, n_chars FROM (
        | SELECT doc_id, source, n_chars,
        |   percent_rank() OVER (PARTITION BY source ORDER BY n_chars) AS pr
        | FROM documents)
        |WHERE pr >= 0.05 AND pr <= 0.95 ORDER BY doc_id""".stripMargin) { (s, d) =>
      SourceMix.filterByGroupPercentile(t(s, d, "documents"),
          col("source"), col("n_chars"), lo = 0.05, hi = 0.95)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    },

    // ---- per-doc mean unigram negative log-likelihood ----
    // The CCNet-style LM-quality proxy under the corpus's own unigram
    // distribution: common-word prose scores low, rare-token soup
    // scores high. ln runs on identical doubles both engines (long/
    // long division), and the per-doc average is rounded to 6 — the
    // established ln-parity contract (q74).
    Q("q80_unigram_logprob",
      """WITH tok AS (SELECT doc_id,
        |  unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        | FROM documents),
        |tok2 AS (SELECT doc_id, term FROM tok WHERE term <> ''),
        |f AS (SELECT term, count(*) AS n FROM tok2 GROUP BY term),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM f)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(avg(-ln(n / tot)), 6) AS avg_logprob
        |FROM tok2 JOIN f USING (term), tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.unigramLogProb(t(s, d, "documents"), "doc_id", col("text"))
        .orderBy(col("doc_id"))
    },

    // ---- head-vocabulary coverage curve (top-20 tokens) ----
    Q("q76_vocab_coverage",
      """WITH tok AS (SELECT
        |  unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        | FROM documents),
        |f AS (SELECT term, count(*) AS n FROM tok WHERE term <> '' GROUP BY term),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM f),
        |top AS (SELECT term, n FROM f ORDER BY n DESC, term LIMIT 20),
        |r AS (SELECT term, n,
        |  row_number() OVER (ORDER BY n DESC, term) AS rank,
        |  CAST(SUM(n) OVER (ORDER BY n DESC, term
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        | FROM top)
        |SELECT CAST(rank AS INTEGER) AS rank, term, n, round(cum / tot, 6) AS cum_share
        |FROM r, tot ORDER BY rank""".stripMargin) { (s, d) =>
      TextAnalysis.vocabCoverage(t(s, d, "documents"), col("text"), k = 20)
        .orderBy(col("rank"))
    },

    // ---- DSIR importance scores (target = src0, raw = the rest) ----
    // Per-raw-doc avg unigram log-likelihood ratio target-vs-raw with
    // add-one smoothing over the union vocabulary — the importance
    // weight behind "select crawl data that looks like the target
    // domain" (Xie et al. 2023). Rank/threshold selection composes on
    // top of the scores.
    Q("q88_dsir_scores",
      """WITH rawd AS (SELECT doc_id, text FROM documents WHERE source <> 'src0'),
        |rtok AS (SELECT doc_id,
        |  unnest(string_split_regex(lower(trim(text)), '\s+')) AS term FROM rawd),
        |rtok2 AS (SELECT doc_id, term FROM rtok WHERE term <> ''),
        |ttok AS (SELECT
        |  unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        | FROM documents WHERE source = 'src0'),
        |ttok2 AS (SELECT term FROM ttok WHERE term <> ''),
        |fr AS (SELECT term, count(*) AS nr FROM rtok2 GROUP BY term),
        |ft AS (SELECT term, count(*) AS nt FROM ttok2 GROUP BY term),
        |v AS (SELECT term, coalesce(nr, 0) AS nr, coalesce(nt, 0) AS nt
        |      FROM fr FULL OUTER JOIN ft USING (term)),
        |tots AS (SELECT CAST(sum(nr) AS BIGINT) AS tr,
        |         CAST(sum(nt) AS BIGINT) AS tt, count(*) AS v FROM v),
        |llr AS (SELECT term,
        |  ln((nt + 1.0) / (tt + v)) - ln((nr + 1.0) / (tr + v)) AS l
        | FROM v, tots)
        |SELECT doc_id, count(*) AS n_tokens, round(avg(l), 6) + 0.0 AS avg_llr
        |FROM rtok2 JOIN llr USING (term)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      graft.ops.Dsir.importanceScores(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"),
          "doc_id", col("text"))
        .orderBy(col("doc_id"))
    },

    // ---- DSIR Gumbel-top-k selection (the sampling step) ----
    // Sample-without-replacement ∝ exp(score/T) via the Gumbel-max
    // trick with sha256-derived noise — both engines reproduce the
    // identical draw. Base scores are q88's ROUNDED avg_llr so the
    // two engines agree on the input bits exactly.
    Q("q90_dsir_select",
      """WITH rawd AS (SELECT doc_id, text FROM documents WHERE source <> 'src0'),
        |rtok AS (SELECT doc_id,
        |  unnest(string_split_regex(lower(trim(text)), '\s+')) AS term FROM rawd),
        |rtok2 AS (SELECT doc_id, term FROM rtok WHERE term <> ''),
        |ttok AS (SELECT
        |  unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        | FROM documents WHERE source = 'src0'),
        |ttok2 AS (SELECT term FROM ttok WHERE term <> ''),
        |fr AS (SELECT term, count(*) AS nr FROM rtok2 GROUP BY term),
        |ft AS (SELECT term, count(*) AS nt FROM ttok2 GROUP BY term),
        |v AS (SELECT term, coalesce(nr, 0) AS nr, coalesce(nt, 0) AS nt
        |      FROM fr FULL OUTER JOIN ft USING (term)),
        |tots AS (SELECT CAST(sum(nr) AS BIGINT) AS tr,
        |         CAST(sum(nt) AS BIGINT) AS tt, count(*) AS v FROM v),
        |llr AS (SELECT term,
        |  ln((nt + 1.0) / (tt + v)) - ln((nr + 1.0) / (tr + v)) AS l
        | FROM v, tots),
        |sc AS (SELECT doc_id, round(avg(l), 6) AS avg_llr
        |       FROM rtok2 JOIN llr USING (term) GROUP BY doc_id),
        |sel AS (SELECT doc_id, avg_llr / 0.5 + -ln(-ln(
        |  (('0x' || substr(sha256('dsir:' || doc_id), 1, 8))::UBIGINT + 1.0)
        |    / 4294967297.0)) AS key
        | FROM sc)
        |SELECT doc_id, round(key, 6) AS sel_key FROM sel
        |ORDER BY key DESC, doc_id LIMIT 50""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val scores = graft.ops.Dsir.importanceScores(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        "doc_id", col("text"))
      graft.ops.Dsir.gumbelTopK(scores, "doc_id", col("avg_llr"),
        k = 50, temperature = 0.5)
    },

    // ---- DSIR hashed n-gram estimator (the paper's feature space) ----
    // Features = non-empty unigrams + adjacent bigrams, each hashed to
    // one of 512 buckets via the cross-engine sha256-prefix hash (the
    // q50/q90 construction) — the vocabulary joins are bounded at the
    // bucket count at any corpus size, and word ORDER now matters.
    // Same add-one LLR core and target split as q88.
    Q("q92_dsir_hashed",
      """WITH rawd AS (SELECT doc_id, text FROM documents WHERE source <> 'src0'),
        |tgtd AS (SELECT doc_id, text FROM documents WHERE source = 'src0'),
        |rw AS (SELECT doc_id, list_filter(
        |  string_split_regex(lower(trim(text)), '\s+'), w -> w <> '') AS ws FROM rawd),
        |tw AS (SELECT doc_id, list_filter(
        |  string_split_regex(lower(trim(text)), '\s+'), w -> w <> '') AS ws FROM tgtd),
        |rf AS (SELECT doc_id, unnest(list_concat(ws,
        |  CASE WHEN len(ws) >= 2 THEN list_transform(range(1, len(ws)),
        |    i -> ws[i] || ' ' || ws[i+1]) ELSE [] END)) AS f FROM rw),
        |tf AS (SELECT doc_id, unnest(list_concat(ws,
        |  CASE WHEN len(ws) >= 2 THEN list_transform(range(1, len(ws)),
        |    i -> ws[i] || ' ' || ws[i+1]) ELSE [] END)) AS f FROM tw),
        |rh AS (SELECT doc_id,
        |  ('0x' || substr(sha256(f), 1, 8))::UBIGINT % 512 AS feat FROM rf),
        |th AS (SELECT
        |  ('0x' || substr(sha256(f), 1, 8))::UBIGINT % 512 AS feat FROM tf),
        |fr AS (SELECT feat, count(*) AS nr FROM rh GROUP BY feat),
        |ft AS (SELECT feat, count(*) AS nt FROM th GROUP BY feat),
        |v AS (SELECT feat, coalesce(nr, 0) AS nr, coalesce(nt, 0) AS nt
        |      FROM fr FULL OUTER JOIN ft USING (feat)),
        |tots AS (SELECT CAST(sum(nr) AS BIGINT) AS tr,
        |         CAST(sum(nt) AS BIGINT) AS tt, count(*) AS v FROM v),
        |llr AS (SELECT feat,
        |  ln((nt + 1.0) / (tt + v)) - ln((nr + 1.0) / (tr + v)) AS l
        | FROM v, tots)
        |SELECT doc_id, count(*) AS n_feats, round(avg(l), 6) + 0.0 AS avg_llr
        |FROM rh JOIN llr USING (feat)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      graft.ops.Dsir.importanceScoresHashed(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"),
          "doc_id", col("text"), buckets = 512)
        .orderBy(col("doc_id"))
    },

    // ---- per-source KL divergence vs the corpus mix ----
    // D(P_source ‖ P_corpus) over add-one-smoothed unigrams on the
    // shared corpus vocabulary — the domain-shift / redundancy
    // diagnostic behind mixture reweighting. Counts are exact
    // integers on both engines; floats only in the final p·ln(p/q)
    // sum, rounded to 6dp.
    Q("q98_kl_divergence",
      """WITH w AS (SELECT source, unnest(list_filter(
        |  string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS wd
        | FROM documents),
        |sc AS (SELECT source, wd, CAST(count(*) AS BIGINT) AS c
        |  FROM w GROUP BY source, wd),
        |cc AS (SELECT wd, CAST(sum(c) AS BIGINT) AS cw FROM sc GROUP BY wd),
        |st AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM sc GROUP BY source),
        |tot AS (SELECT CAST(sum(cw) AS BIGINT) AS nt,
        |        CAST(count(*) AS BIGINT) AS v FROM cc),
        |p AS (SELECT st.source, st.n,
        |   (coalesce(x.c, 0) + 1) / CAST(st.n + tot.v AS DOUBLE) AS ps,
        |   (cc.cw + 1) / CAST(tot.nt + tot.v AS DOUBLE) AS qw
        |  FROM cc CROSS JOIN st CROSS JOIN tot
        |  LEFT JOIN sc x ON st.source = x.source AND cc.wd = x.wd)
        |SELECT source, n AS n_tokens, round(sum(ps * ln(ps / qw)), 6) AS kl
        |FROM p GROUP BY source, n ORDER BY source""".stripMargin) { (s, d) =>
      SourceMix.klDivergence(t(s, d, "documents"), col("source"), col("text"))
        .orderBy(col("source"))
    },

    // ---- Naive Bayes domain classifier: model grid ----
    // Train-by-counting on a ~86% doc_id split (doc_id % 7 ≠ 0; 7 is
    // coprime with the generator's source = src(doc_id % 20)
    // assignment, so every class appears on BOTH sides — a % 5 split
    // held out four ENTIRE classes and made held-out accuracy
    // structurally zero). Label = source; emit
    // the FULL smoothed model grid — every (class, vocab term) pair
    // including zero counts. Counts are exact integers both engines;
    // ln runs on identical doubles ((n+1)/(tot_c+V), both exact in
    // f64), rounded 6dp per the q74/q88 contract.
    Q("q140_nb_model",
      s"""WITH $nbTrainCte
        |SELECT label, term, n, round(ln((n + 1.0) / (tot_c + v)), 6) + 0.0 AS log_cond
        |FROM grid, vv ORDER BY label, term""".stripMargin) { (s, d) =>
      // log_cond straddles zero (a dominant term's smoothed prob can
      // graze 1) → `+ 0.0` signed-zero normalization (r19 audit)
      val docs = t(s, d, "documents")
      TextClassifier.trainNaiveBayes(
          docs.filter(col("doc_id") % 7 =!= 0), col("source"), col("text"))
        .select(col("label"), col("term"), col("n"),
          graft.expr.Functions.roundZ(col("log_cond"), 6).as("log_cond"))
        .orderBy(col("label"), col("term"))
    },

    // ---- Naive Bayes domain classifier: held-out predictions ----
    // Score the 20% held-out docs against the q140 model: per-class
    // length-normalized log-likelihood + normalized prior, argmax on
    // the ROUNDED score with label-ascending tie-break (the q74 rank
    // discipline). Unseen terms take the class's smoothing floor.
    Q("q141_nb_classify",
      s"""WITH $nbTrainCte,
        |$nbScoreCte
        |SELECT doc_id, label AS pred_label, score, n_tokens
        |FROM p WHERE rk = 1 ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val model = TextClassifier.trainNaiveBayes(
        docs.filter(col("doc_id") % 7 =!= 0), col("source"), col("text"))
      TextClassifier.classifyNaiveBayes(
          docs.filter(col("doc_id") % 7 === 0), col("doc_id"), col("text"), model)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    },

    // ---- Naive Bayes domain classifier: held-out confusion ----
    // Predictions joined back to true sources; each (true, pred) cell
    // reports its share of the true-label row — the report that prices
    // the classifier before a corpus-wide gate is applied.
    Q("q142_nb_confusion",
      s"""WITH $nbTrainCte,
        |$nbScoreCte,
        |pd AS (SELECT doc_id, label AS pred_label FROM p WHERE rk = 1),
        |cm AS (SELECT d.source AS true_label, pd.pred_label,
        |  CAST(count(*) AS BIGINT) AS n
        | FROM pd JOIN documents d USING (doc_id) GROUP BY 1, 2)
        |SELECT true_label, pred_label, n,
        | round(n / CAST(sum(n) OVER (PARTITION BY true_label) AS DOUBLE), 6)
        |   AS share
        |FROM cm ORDER BY true_label, pred_label""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val model = TextClassifier.trainNaiveBayes(
        docs.filter(col("doc_id") % 7 =!= 0), col("source"), col("text"))
      val pred = TextClassifier.classifyNaiveBayes(
        docs.filter(col("doc_id") % 7 === 0), col("doc_id"), col("text"), model)
      TextClassifier.nbConfusion(pred,
          docs.filter(col("doc_id") % 7 === 0), col("doc_id"), col("source"))
        .orderBy(col("true_label"), col("pred_label"))
    },

    // ---- Naive Bayes classifier: per-class precision/recall/F1 ----
    // The one-row-per-class summary of q142's cells. F1 is the total
    // algebraic form 2·tp/(n_pred+n_true) — exact-integer ratio until
    // the single rounded division, no epsilon needed cross-engine.
    Q("q143_nb_metrics",
      s"""WITH $nbTrainCte,
        |$nbScoreCte,
        |pd AS (SELECT doc_id, label AS pred_label FROM p WHERE rk = 1),
        |j AS (SELECT d.source AS true_label, pd.pred_label
        | FROM pd JOIN documents d USING (doc_id)),
        |bt AS (SELECT true_label AS label, CAST(count(*) AS BIGINT) AS n_true
        |  FROM j GROUP BY 1),
        |bp AS (SELECT pred_label AS label, CAST(count(*) AS BIGINT) AS n_pred
        |  FROM j GROUP BY 1),
        |tpc AS (SELECT true_label AS label, CAST(count(*) AS BIGINT) AS tp
        |  FROM j WHERE true_label = pred_label GROUP BY 1)
        |SELECT coalesce(bt.label, bp.label) AS label,
        | CAST(coalesce(n_true, 0) AS BIGINT) AS n_true,
        | CAST(coalesce(n_pred, 0) AS BIGINT) AS n_pred,
        | CAST(coalesce(tpc.tp, 0) AS BIGINT) AS tp,
        | round(CASE WHEN coalesce(n_pred, 0) = 0 THEN 0.0
        |   ELSE coalesce(tpc.tp, 0) / CAST(n_pred AS DOUBLE) END, 6)
        |   AS "precision",
        | round(CASE WHEN coalesce(n_true, 0) = 0 THEN 0.0
        |   ELSE coalesce(tpc.tp, 0) / CAST(n_true AS DOUBLE) END, 6) AS recall,
        | round(2.0 * coalesce(tpc.tp, 0)
        |   / CAST(coalesce(n_true, 0) + coalesce(n_pred, 0) AS DOUBLE), 6) AS f1
        |FROM bt FULL JOIN bp ON bt.label = bp.label
        |LEFT JOIN tpc ON coalesce(bt.label, bp.label) = tpc.label
        |ORDER BY label""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val model = TextClassifier.trainNaiveBayes(
        docs.filter(col("doc_id") % 7 =!= 0), col("source"), col("text"))
      val pred = TextClassifier.classifyNaiveBayes(
        docs.filter(col("doc_id") % 7 === 0), col("doc_id"), col("text"), model)
      TextClassifier.nbMetricsReport(pred,
          docs.filter(col("doc_id") % 7 === 0), col("doc_id"), col("source"))
        .orderBy(col("label"))
    },

    // ---- quality-gate threshold sweep (CCNet-style calibration) ----
    // Per (source, threshold): how many docs a "unigram-LM avg neg-log-
    // prob <= t" gate keeps — the keep-rate table read before applying
    // a corpus-wide perplexity gate. Scores are q80's rounded 6dp
    // values (already oracle-pinned), thresholds an exact literal grid,
    // so the comparison is on identical doubles in both engines.
    Q("q144_gate_sweep",
      """WITH tok AS (SELECT doc_id,
        |  unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        | FROM documents),
        |tok2 AS (SELECT doc_id, term FROM tok WHERE term <> ''),
        |f AS (SELECT term, count(*) AS n FROM tok2 GROUP BY term),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM f),
        |sc AS (SELECT doc_id, round(avg(-ln(n / tot)), 6) AS alp
        | FROM tok2 JOIN f USING (term), tot GROUP BY doc_id),
        |sd AS (SELECT d.source AS "group", sc.alp
        | FROM sc JOIN documents d USING (doc_id)),
        |th AS (SELECT CAST(unnest([3.3, 3.35, 3.4, 3.45, 3.5, 3.6, 3.7])
        |  AS DOUBLE) AS threshold)
        |SELECT "group", threshold, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(CASE WHEN alp <= threshold THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_kept,
        | round(sum(CASE WHEN alp <= threshold THEN 1 ELSE 0 END)
        |   / CAST(count(*) AS DOUBLE), 6) AS keep_rate
        |FROM sd CROSS JOIN th GROUP BY 1, 2
        |ORDER BY "group", threshold""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val scored = graft.ops.TextAnalysis
        .unigramLogProb(docs, "doc_id", col("text"))
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
      graft.ops.CorpusReports.thresholdSweep(scored, col("source"),
          col("avg_logprob"),
          Seq(3.3, 3.35, 3.4, 3.45, 3.5, 3.6, 3.7), keepBelow = true)
        .orderBy(col("group"), col("threshold"))
    },

    // ---- Naive Bayes: incremental training path under the q140 oracle ----
    // The same training corpus ingested as TWO batches of sufficient
    // statistics (split doc_id % 2), merged by keyed integer sum, then
    // trained from the merged stats. Counts are exact integers and the
    // grid derivation runs identical arithmetic, so the incremental
    // path must reproduce q140's grid EXACTLY — the oracle SQL is
    // q140's verbatim. This is the daily-refresh contract at corpus
    // scale: a new batch costs one count pass over its own rows, never
    // a re-read of the corpus.
    Q("q145_nb_incremental",
      s"""WITH $nbTrainCte
        |SELECT label, term, n, round(ln((n + 1.0) / (tot_c + v)), 6) + 0.0 AS log_cond
        |FROM grid, vv ORDER BY label, term""".stripMargin) { (s, d) =>
      val train = t(s, d, "documents").filter(col("doc_id") % 7 =!= 0)
      val s1 = TextClassifier.nbSufficientStats(
        train.filter(col("doc_id") % 2 === 0), col("source"), col("text"))
      val s2 = TextClassifier.nbSufficientStats(
        train.filter(col("doc_id") % 2 =!= 0), col("source"), col("text"))
      TextClassifier.trainFromStats(TextClassifier.mergeNbStats(s1, s2))
        .select(col("label"), col("term"), col("n"),
          graft.expr.Functions.roundZ(col("log_cond"), 6).as("log_cond"))
        .orderBy(col("label"), col("term"))
    },

    // ---- tokenizer fertility per source ----
    // Whitespace words vs BPE-ish subword tokens vs characters — the
    // table that prices a tokenizer choice per source before a
    // corpus-wide tokenization run. Exact integer counts (q23's two
    // pinned token definitions verbatim); the two ratios are the only
    // rounded values.
    Q("q146_tokenizer_fertility",
      """WITH c AS (SELECT source,
        |  len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |    x -> x <> '')) AS w,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
        |    AS b,
        |  length(text) AS ch
        | FROM documents)
        |SELECT source AS "group", CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(w) AS BIGINT) AS words,
        | CAST(sum(b) AS BIGINT) AS bpe_tokens,
        | CAST(sum(ch) AS BIGINT) AS chars,
        | round(sum(b) / CAST(sum(w) AS DOUBLE), 6) AS fertility,
        | round(sum(ch) / CAST(sum(b) AS DOUBLE), 6) AS chars_per_token
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      graft.ops.CorpusReports.tokenizerFertilityReport(
          t(s, d, "documents"), col("source"), col("text"))
        .orderBy(col("group"))
    },

    // ---- Naive Bayes: accuracy by confidence margin ----
    // margin = top1 − top2 rounded score per held-out doc, bucketed
    // into a fixed band grid; per band, how often the top-1 label is
    // right. If accuracy does not rise with margin, score-threshold
    // gating is unjustified for this classifier. Both engines subtract
    // identical rounded doubles and compare to identical literals.
    Q("q147_nb_confidence",
      s"""WITH $nbTrainCte,
        |$nbScoreCte,
        |topp AS (SELECT doc_id,
        |  max(CASE WHEN rk = 1 THEN score END) AS s1,
        |  max(CASE WHEN rk = 1 THEN label END) AS pred_label,
        |  max(CASE WHEN rk = 2 THEN score END) AS s2
        | FROM p WHERE rk <= 2 GROUP BY doc_id),
        |m AS (SELECT doc_id, pred_label, s1 - s2 AS mg
        | FROM topp WHERE s2 IS NOT NULL),
        |j AS (SELECT CAST(CASE WHEN mg >= 0.02 THEN 0.02
        |    WHEN mg >= 0.01 THEN 0.01 WHEN mg >= 0.005 THEN 0.005
        |    WHEN mg >= 0.002 THEN 0.002
        |    ELSE 0.0 END AS DOUBLE) AS band_lo,
        |  CASE WHEN m.pred_label = d.source THEN 1 ELSE 0 END AS ok
        | FROM m JOIN documents d USING (doc_id))
        |SELECT band_lo, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(ok) AS BIGINT) AS n_correct,
        | round(sum(ok) / CAST(count(*) AS DOUBLE), 6) AS accuracy
        |FROM j GROUP BY 1 ORDER BY band_lo""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val model = TextClassifier.trainNaiveBayes(
        docs.filter(col("doc_id") % 7 =!= 0), col("source"), col("text"))
      TextClassifier.nbConfidenceReport(
          docs.filter(col("doc_id") % 7 === 0), col("doc_id"), col("text"),
          model, docs.filter(col("doc_id") % 7 === 0), col("source"),
          // grid sized to the avg-ll margin scale this corpus actually
          // produces (median ~8e-3, max ~4e-2) so every band populates
          bands = Seq(0.0, 0.002, 0.005, 0.01, 0.02))
        .orderBy(col("band_lo"))
    },

    // ---- Naive Bayes: the gate itself ----
    // Train on the labeled seed (the % 7 split), score the WHOLE
    // corpus, keep exactly the docs whose top-1 label is in the
    // allowed set and whose rounded score clears the literal
    // threshold — the filtered-corpus emit that q144's sweep and
    // q147's calibration table exist to configure. Both engines
    // compare the same rounded 6dp score to the same literal.
    Q("q148_nb_gate",
      s"""WITH $nbTrainCte,
        |$nbScoreAllCte,
        |pd AS (SELECT doc_id, label AS pred_label, score
        | FROM p WHERE rk = 1)
        |SELECT d.doc_id, d.source, pd.pred_label, pd.score
        |FROM pd JOIN documents d USING (doc_id)
        |WHERE pd.pred_label IN ('src0','src1','src2','src3','src4',
        |  'src5','src6','src7','src8','src9') AND pd.score >= -3.43
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val model = TextClassifier.trainNaiveBayes(
        docs.filter(col("doc_id") % 7 =!= 0), col("source"), col("text"))
      TextClassifier.classifierGate(docs, col("doc_id"), col("text"),
          model, (0 to 9).map(i => s"src$i"), minScore = -3.43)
        .select(col("doc_id"), col("source"), col("pred_label"), col("score"))
        .orderBy(col("doc_id"))
    },

    // ---- Naive Bayes: the sparse (deployment) trainer ----
    // trainNaiveBayesSparse emits the observed (label, term) rows
    // only — at web scale the dense |vocab|×|classes| grid (q140's
    // oracle artifact) is mostly zeros nothing consumes (the zero-row
    // poison pin), so the deployment model store is this table. Full
    // hash parity on every model quantity the scorers read: the
    // smoothed conditional plus the class-level oov floor and prior
    // replicated onto each row. Same q140 split and smoothing.
    Q("q149_nb_sparse_model",
      s"""WITH $nbTrainCte,
        |cd AS (SELECT source AS label, CAST(count(*) AS BIGINT) AS n_docs_c
        |  FROM documents WHERE doc_id % 7 <> 0 GROUP BY 1),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents WHERE doc_id % 7 <> 0)
        |SELECT c.label, c.term, c.n,
        |  round(ln((c.n + 1.0) / (ct.tot_c + vv.v)), 6) + 0.0 AS log_cond,
        |  round(ln(1.0 / (ct.tot_c + vv.v)), 6) + 0.0 AS oov_ll,
        |  round(ln(cd.n_docs_c / CAST(nd.n_docs AS DOUBLE)), 6) + 0.0 AS log_prior
        |FROM cnt c JOIN ct USING (label) JOIN cd USING (label), vv, nd
        |ORDER BY label, term""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      TextClassifier.trainNaiveBayesSparse(
          docs.filter(col("doc_id") % 7 =!= 0), col("source"), col("text"))
        .select(col("label"), col("term"), col("n"),
          graft.expr.Functions.roundZ(col("log_cond"), 6).as("log_cond"),
          graft.expr.Functions.roundZ(col("oov_ll"), 6).as("oov_ll"),
          graft.expr.Functions.roundZ(col("log_prior"), 6).as("log_prior"))
        .orderBy(col("label"), col("term"))
    },
  )

  /** Shared NB training CTEs (q140–q142): ~86% doc_id % 7 split
    * (coprime with the generator's source = src(doc_id % 20), so no
    * class is ever fully held out), label = source, add-one smoothing
    * over the training vocabulary. */
  private def nbTrainCte: String =
    """tr AS (SELECT source AS label, text FROM documents WHERE doc_id % 7 <> 0),
      |tok AS (SELECT label, unnest(list_filter(
      |  string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS term
      | FROM tr),
      |cnt AS (SELECT label, term, CAST(count(*) AS BIGINT) AS n
      |  FROM tok GROUP BY 1, 2),
      |ct AS (SELECT label, CAST(sum(n) AS BIGINT) AS tot_c FROM cnt GROUP BY 1),
      |voc AS (SELECT DISTINCT term FROM cnt),
      |vv AS (SELECT CAST(count(*) AS BIGINT) AS v FROM voc),
      |grid AS (SELECT ct.label, voc.term, CAST(coalesce(c.n, 0) AS BIGINT) AS n,
      |  ct.tot_c
      | FROM voc CROSS JOIN ct
      | LEFT JOIN cnt c ON c.label = ct.label AND c.term = voc.term)""".stripMargin

  /** q148's scoring CTEs: identical to [[nbScoreCte]] except the
    * scored set is the WHOLE corpus (a gate classifies everything,
    * training docs included), so `htf` drops the split filter. Same
    * alias names — the two blocks never appear in one query. */
  private def nbScoreAllCte: String = {
    val out = nbScoreCte.replace(
      "  FROM documents WHERE doc_id % 7 = 0) GROUP BY 1, 2)",
      "  FROM documents) GROUP BY 1, 2)")
    // Exact-substring derivation: a reformat of that line in
    // nbScoreCte would otherwise silently no-op the replace and
    // revert q148's oracle to held-out-only scoring — fail loudly at
    // construction instead of as a confusing hash mismatch.
    require(out != nbScoreCte,
      "nbScoreAllCte: split-filter line not found in nbScoreCte — the CTE drifted")
    out
  }

  /** Shared NB scoring CTEs (q141/q142): held-out ~14% split scored
    * per class, ranked on the rounded score then label. */
  private def nbScoreCte: String =
    """cd AS (SELECT source AS label, CAST(count(*) AS BIGINT) AS n_docs_c
      |  FROM documents WHERE doc_id % 7 <> 0 GROUP BY 1),
      |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs
      |  FROM documents WHERE doc_id % 7 <> 0),
      |cls AS (SELECT ct.label, ct.tot_c,
      |  ln(cd.n_docs_c / CAST(nd.n_docs AS DOUBLE)) AS log_prior
      | FROM ct JOIN cd USING (label), nd),
      |htf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS cnt FROM (
      |  SELECT doc_id, unnest(list_filter(
      |    string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')) AS term
      |  FROM documents WHERE doc_id % 7 = 0) GROUP BY 1, 2),
      |sc AS (SELECT h.doc_id, c.label,
      |  sum(h.cnt * coalesce(ln((m.n + 1.0) / (c.tot_c + vv.v)),
      |                       ln(1.0 / (c.tot_c + vv.v)))) / sum(h.cnt) AS avg_ll,
      |  CAST(sum(h.cnt) AS BIGINT) AS n_tokens,
      |  any_value(c.log_prior) AS log_prior
      | FROM htf h CROSS JOIN cls c CROSS JOIN vv
      | LEFT JOIN cnt m ON m.label = c.label AND m.term = h.term
      | GROUP BY 1, 2),
      |p AS (SELECT doc_id, label,
      |  round(avg_ll + log_prior / n_tokens, 6) AS score, n_tokens,
      |  row_number() OVER (PARTITION BY doc_id
      |    ORDER BY round(avg_ll + log_prior / n_tokens, 6) DESC, label) AS rk
      | FROM sc)""".stripMargin
}
