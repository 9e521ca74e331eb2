package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level distribution reports: lexical diversity, Zipf
  * rank-frequency shape, and token-length histograms — the per-source
  * dashboards a data-mix owner reads before trusting a source enough
  * to train on it. Synthetic/templated/spam sources show up here
  * before any per-doc gate fires: collapsed type-token ratios, a
  * too-shallow (or too-steep) Zipf slope, a spiked length histogram.
  */
object CorpusReports {

  import NearDup.tokens

  /** Per-source lexical diversity: token totals, distinct unigram and
    * bigram counts, and their type-token ratios. A natural-language
    * source holds unigram TTR well under 1 but bigram TTR near 1;
    * template spam collapses the bigram ratio first (the Gopher
    * repetition signal, aggregated to source level).
    *
    * Scale: one explode per n-gram order, each aggregated with
    * map-side combine; bigrams become the (source, bigram) distinct
    * BEFORE counting so the shuffle carries one row per distinct
    * n-gram, not per occurrence. */
  def diversityReport(df: DataFrame, source: Column, text: Column,
      roundTo: Int = 6): DataFrame = {
    val toks = df.select(source.as("source"),
        filter(tokens(text), t => t =!= "").as("__w"))
    val uni = toks.select(col("source"), explode(col("__w")).as("__t"))
    val uniAgg = uni.groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("__t")).as("distinct_unigrams"))
    val bi = toks
      .filter(size(col("__w")) >= 2)
      .select(col("source"), explode(
        zip_with(slice(col("__w"), lit(1), size(col("__w")) - 1),
          slice(col("__w"), lit(2), size(col("__w")) - 1),
          (a, b) => concat(a, lit(" "), b))).as("__bg"))
    val biAgg = bi.groupBy(col("source"))
      .agg(count(lit(1)).as("n_bigrams"),
        countDistinct(col("__bg")).as("distinct_bigrams"))
    uniAgg.join(biAgg, Seq("source"), "left")
      .select(col("source"), col("n_tokens"), col("distinct_unigrams"),
        round(col("distinct_unigrams") / col("n_tokens").cast("double"),
          roundTo).as("unigram_ttr"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("distinct_bigrams"), lit(0L)).as("distinct_bigrams"),
        round(coalesce(col("distinct_bigrams") / col("n_bigrams").cast("double"),
          lit(0.0)), roundTo).as("bigram_ttr"))
  }

  /** Per-source Zipf fit: least-squares slope of ln(frequency) on
    * ln(rank) over the top-`topRanks` words (rank = frequency DESC,
    * word ASC — deterministic under ties). Natural language sits near
    * −1 (Zipf's law); templated or model-generated text flattens the
    * head (slope → 0) or collapses to a few tokens (slope ≪ −1), so
    * the slope is a cheap source-level synthetic-text tell.
    *
    * Scale note: the rank window partitions by source, so one task
    * sorts one source's VOCABULARY (counts, not occurrences) — fine to
    * tens of millions of types; beyond that, pre-trim with a count
    * floor before ranking (an under-floor word cannot reach the
    * top-100 of any corpus with ≥100 common words). */
  def zipfReport(df: DataFrame, source: Column, text: Column,
      topRanks: Int = 100, roundTo: Int = 6): DataFrame = {
    require(topRanks >= 2, s"zipfReport: topRanks=$topRanks needs >= 2 points")
    val wc = df.select(source.as("source"), explode(tokens(text)).as("__t"))
      .filter(col("__t") =!= "")
      .groupBy(col("source"), col("__t"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("__c").desc, col("__t").asc)
    val ranked = wc.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= topRanks)
      .select(col("source"), log(col("__rn").cast("double")).as("__x"),
        log(col("__c").cast("double")).as("__y"))
    // a one-word vocabulary has var_pop(ln rank) = 0 — a fit over one
    // point is undefined, so report an explicit null slope/intercept
    // (topRanks>=2 validates the PARAMETER; this guards the DATA)
    ranked.groupBy(col("source"))
      .agg(count(lit(1)).as("n_ranks"),
        // roundZ: signed-zero normalization (r19 audit) — a flat-slope
        // fit can round to -0.0 in DuckDB; null + 0.0 stays null
        graft.expr.Functions.roundZ(when(var_pop(col("__x")) > 0,
          covar_pop(col("__y"), col("__x")) / var_pop(col("__x"))),
          roundTo).as("zipf_slope"),
        round(when(var_pop(col("__x")) > 0,
          avg(col("__y")) -
            covar_pop(col("__y"), col("__x")) / var_pop(col("__x"))
              * avg(col("__x"))), roundTo).as("zipf_intercept"))
  }

  /** Pairwise source vocabulary overlap: Jaccard between each pair of
    * sources' top-`topV` word sets (rank = count DESC, word ASC).
    * Near-identical vocabularies across supposedly-independent sources
    * are the classic mirror/syndication tell; near-zero overlap flags
    * a source that isn't the language it claims. DENSE over all
    * source pairs — a zero-overlap pair reports 0, not a missing row.
    *
    * Scale: vocab is count-aggregated per source (map-side combine)
    * before the top-V window; the pair join then runs over ≤
    * sources × topV rows — source-pair output is sources², which a
    * mix dashboard wants anyway. */
  def sourceVocabOverlap(df: DataFrame, source: Column, text: Column,
      topV: Int = 200, roundTo: Int = 6): DataFrame = {
    require(topV >= 1, s"sourceVocabOverlap: topV=$topV")
    val wc = df.select(source.as("source"), explode(tokens(text)).as("__t"))
      .filter(col("__t") =!= "")
      .groupBy(col("source"), col("__t"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("__c").desc, col("__t").asc)
    val vocab = wc.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= topV)
      .select(col("source"), col("__t"))
    val sizes = vocab.groupBy(col("source")).agg(count(lit(1)).as("__n"))
    val inter = vocab.as("a").join(vocab.as("b"),
        col("a.__t") === col("b.__t") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("__i"))
    val pairs = sizes.as("sa").join(sizes.as("sb"),
        col("sa.source") < col("sb.source"))
      .select(col("sa.source").as("source_a"), col("sb.source").as("source_b"),
        col("sa.__n").as("__na"), col("sb.__n").as("__nb"))
    pairs.join(inter, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"),
        coalesce(col("__i"), lit(0L)).as("overlap"),
        round(coalesce(col("__i"), lit(0L)) /
          (col("__na") + col("__nb") - coalesce(col("__i"), lit(0L)))
            .cast("double"), roundTo).as("jaccard"))
  }

  /** Corpus-wide top-`k` repeated `n`-gram phrases — the boilerplate
    * DISCOVERY report (`TextAnalysis.removeBoilerplateLines` removes
    * known repeats; this surfaces what repeats, ranked). Map-side
    * partial aggregation collapses each partition's repeated phrases
    * before the exchange (repetition is the premise, so the shuffle
    * carries distinct phrases, not occurrences); the cut is a
    * TakeOrdered, never a global sort. */
  def topPhrases(df: DataFrame, text: Column, n: Int = 3,
      k: Int = 50): DataFrame = {
    require(n >= 2 && n <= 5, s"topPhrases: n=$n (2–5 supported)")
    require(k >= 1, s"topPhrases: k=$k")
    val ws = filter(tokens(text), t => t =!= "")
    // n aligned slices zipped into phrases: slice i drops the first
    // i tokens, so position j holds tokens j..j+n-1 joined
    val grams = (1 until n).foldLeft(
        slice(ws, lit(1), greatest(size(ws) - (n - 1), lit(0)))) {
      case (acc, i) =>
        zip_with(acc,
          slice(ws, lit(i + 1), greatest(size(ws) - (n - 1), lit(0))),
          (a, b) => concat(a, lit(" "), b))
    }
    df.select(explode(grams).as("phrase"))
      .groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("phrase").asc)
      .limit(k)
  }

  /** IVF index-health report over a cell assignment (id, cell):
    * cell count, min/max/mean occupancy, and the hot-cell count
    * (> 2× mean) — a skewed quantizer makes probe cost unpredictable
    * long before recall degrades, and this one row says so before
    * anything ships. Integer-exact except the mean (exact division,
    * rounded for display). */
  def cellOccupancyReport(cells: DataFrame, cellCol: String,
      roundTo: Int = 6): DataFrame = {
    val occ = cells.groupBy(col(cellCol)).agg(count(lit(1)).as("__c"))
    // one-row totals broadcast back over the per-cell counts (the
    // Bm25 `tot` pattern) — the hot-cell test needs the mean, which
    // cannot nest inside the same aggregation
    val tot = occ.agg(count(lit(1)).as("n_cells"),
      min(col("__c")).as("min_occ"), max(col("__c")).as("max_occ"),
      (sum(col("__c")).cast("double") / count(lit(1))).as("__mean"))
    occ.crossJoin(broadcast(tot))
      .groupBy(col("n_cells"), col("min_occ"), col("max_occ"), col("__mean"))
      .agg(sum(when(col("__c").cast("double") > lit(2.0) * col("__mean"), 1L)
        .otherwise(0L)).as("hot_cells"))
      .select(col("n_cells"), col("min_occ"), col("max_occ"),
        round(col("__mean"), roundTo).as("mean_occ"), col("hot_cells"))
  }

  /** Per-source token-count histogram in power-of-two buckets:
    * bucket = bit length of the token count (0 for empty docs), i.e.
    * docs of 2^(b−1)…2^b−1 tokens share bucket b. Integer-exact on
    * both engines (string length of the binary representation — no
    * floating log2 at the 2^k boundaries). One map-side projection +
    * one aggregation. */
  def tokenLengthHistogram(df: DataFrame, source: Column,
      text: Column): DataFrame = {
    val n = size(filter(tokens(text), t => t =!= "")).cast("long")
    df.select(source.as("source"),
        when(n <= 0, lit(0)).otherwise(length(bin(n))).as("bucket"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Per-source EXACT-duplicate rate: the fraction of each source's
    * docs whose content fingerprint (first 16 hex of sha256) occurs
    * more than once corpus-WIDE — the before/after number an exact
    * dedup pass (q12) is judged by, per source, and the cheap sibling
    * of the near-dup matrix (`sourcePairMatrix`): a source that is
    * mostly copies of other sources shows a high rate here first.
    *
    * Scale: text collapses to the 16-hex fingerprint in the initial
    * projection; the global count and the count-back join shuffle
    * only (fingerprint, count) pairs. At 64 bits the birthday
    * collision term is ~N²/2⁶⁵ — negligible false-dup mass at any
    * corpus this fingerprint is used for (same contract as the F8
    * surrogate key). */
  def exactDupRateReport(df: DataFrame, source: Column,
      text: Column, roundTo: Int = 6): DataFrame = {
    val h = df.select(source.as("source"),
      substring(sha2(text, 256), 1, 16).as("__h"))
    val counts = h.groupBy(col("__h")).agg(count(lit(1)).as("__c"))
    h.join(counts, Seq("__h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__c") > 1, 1L).otherwise(0L)).as("dup_docs"))
      .select(col("source"), col("n_docs"), col("dup_docs"),
        round(col("dup_docs").cast("double") / col("n_docs"), roundTo)
          .as("dup_rate"))
  }

  /** Per-source hapax legomenon rate: the fraction of the vocabulary
    * (and of tokens) occurring exactly once. Natural text holds a
    * hapax-vocab share around 0.4–0.6 (Zipf's tail); templated or
    * heavily deduplicated text collapses it, OCR noise and
    * concatenated-garbage sources inflate it — a sharper tail-health
    * signal than TTR, which the big head counts dominate.
    *
    * Scale: (source, word) counts with map-side combine, then one
    * per-source rollup — the diversityReport shuffle shape; ratios
    * are integer/integer at 6dp. */
  def hapaxReport(df: DataFrame, source: Column, text: Column,
      roundTo: Int = 6): DataFrame = {
    val toks = df.select(source.as("source"), explode(tokens(text)).as("__t"))
      .filter(col("__t") =!= "")
    toks.groupBy(col("source"), col("__t")).agg(count(lit(1)).as("__c"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("vocab"), sum(col("__c")).as("n_tokens"),
        sum(when(col("__c") === 1, 1L).otherwise(0L)).as("hapax"))
      .select(col("source"), col("vocab"), col("n_tokens"), col("hapax"),
        round(col("hapax").cast("double") / col("vocab"), roundTo)
          .as("hapax_vocab_share"),
        round(col("hapax").cast("double") / col("n_tokens"), roundTo)
          .as("hapax_token_share"))
  }

  /** Cluster-quality report over a cell/cluster assignment joined to
    * a ground-truth label: per cluster, its size, the majority label,
    * that label's count, and the purity (majority fraction) — the
    * standard external clustering metric, per-row so a skewed
    * quantizer's bad cells are visible individually (a single overall
    * purity hides them behind the big clean clusters). Majority ties
    * break to the smaller label so the report is deterministic.
    *
    * Scale: one (cell, label) count agg (map-side combine), then a
    * per-cell window over the label counts — state is bounded by the
    * label-set size per cell, never by rows. */
  def clusterPurityReport(df: DataFrame, cellCol: String,
      labelCol: String, roundTo: Int = 6): DataFrame = {
    val cl = df.groupBy(col(cellCol), col(labelCol))
      .agg(count(lit(1)).as("__n"))
    val perCell = Window.partitionBy(col(cellCol))
    val rank = Window.partitionBy(col(cellCol))
      .orderBy(col("__n").desc, col(labelCol).asc)
    cl.withColumn("__rn", row_number().over(rank))
      .withColumn("n_cell", sum(col("__n")).over(perCell))
      .filter(col("__rn") === 1)
      .select(col(cellCol), col("n_cell"),
        col(labelCol).as("majority_label"), col("__n").as("majority_n"),
        round(col("__n").cast("double") / col("n_cell"), roundTo).as("purity"))
  }

  /** Cross-source duplication matrix: given candidate near-dup pairs
    * (id_a, id_b) and an id → source map, counts pairs per unordered
    * source pair — the provenance report that says WHICH sources
    * mirror each other (aggregator sites re-hosting a crawl, two
    * dumps of the same upstream), which per-doc dedup rates cannot
    * show. Diagonal rows are within-source duplication.
    *
    * Scale: two equi-joins on the 8-byte id (the pair frame never
    * carries text), then a sources² agg. The meta side prunes to
    * (id, source) — at corpus scale both joins shuffle only ids and
    * short source names. */
  def sourcePairMatrix(pairs: DataFrame, meta: DataFrame, id: String,
      source: Column, idA: String = "doc_a",
      idB: String = "doc_b"): DataFrame = {
    val m = meta.select(col(id).as("__mid"), source.as("__msrc"))
    val withSrc = pairs
      .join(m, col(idA) === col("__mid"))
      .select(col(idA), col(idB), col("__msrc").as("__sa"))
      .join(m, col(idB) === col("__mid"))
      .select(col("__sa"), col("__msrc").as("__sb"))
    withSrc
      .select(least(col("__sa"), col("__sb")).as("source_a"),
        greatest(col("__sa"), col("__sb")).as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Truncation-loss curve: for each candidate max sequence length,
    * how many documents fit whole and what fraction of corpus tokens
    * survive `least(n_tokens, L)` truncation — the one table a
    * pretraining owner reads before fixing the context length (too
    * short burns tail tokens, too long burns padding/packing slack;
    * `Packing.packGreedy` handles the second term, this prices the
    * first). Whitespace token counts, like every token gate here.
    *
    * Scale: one map-side projection computes the token count, then a
    * per-row explode over the (tiny, constant) length list feeds a
    * |lens|-group aggregation — no join, no window, partial aggs
    * collapse everything before the exchange. */
  def truncationLossReport(df: DataFrame, text: Column,
      lens: Seq[Int], roundTo: Int = 6): DataFrame = {
    require(lens.nonEmpty, "truncationLossReport: need at least one length")
    val n = size(filter(tokens(text), t => t =!= "")).cast("long")
    df.select(n.as("__n"),
        explode(array(lens.map(l => lit(l.toLong)): _*)).as("max_len"))
      .groupBy(col("max_len"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__n") <= col("max_len"), 1L).otherwise(0L))
          .as("docs_fit"),
        sum(col("__n")).as("tokens_total"),
        sum(least(col("__n"), col("max_len"))).as("tokens_kept"))
      .select(col("max_len"), col("n_docs"), col("docs_fit"),
        round(col("docs_fit").cast("double") / col("n_docs"), roundTo)
          .as("frac_docs_fit"),
        col("tokens_total"), col("tokens_kept"),
        round(col("tokens_kept").cast("double") / col("tokens_total"),
          roundTo).as("frac_tokens_kept"))
  }

  /** Per-source EXACT token-length percentiles (nearest-rank): for
    * each requested quantile p, the smallest length whose running doc
    * count reaches ceil(p·n). The companion to `truncationLossReport`:
    * that table prices a candidate context length, this one says where
    * the candidates ARE (p50/p90/p99 per source) — and exactness makes
    * it oracle-checkable, where `approx_percentile` answers drift by
    * sketch state.
    *
    * Scale: rows collapse to (source, len) counts with map-side
    * combine — the only row-proportional shuffle. The cumulative-sum
    * window then runs over DISTINCT lengths per source (bounded by the
    * longest doc, ~1e5 buckets at web scale — not by corpus rows), and
    * each of those rows tests every requested quantile via a
    * constant-size explode. No row-level sort anywhere: this is the
    * standard exact-quantile-by-histogram decomposition. When even the
    * distinct-length relation is too hot (e.g. percentiles of a
    * continuous score, not an integer length), `approx_percentile`
    * over the raw rows is the documented fallback at ±accuracy. */
  def lengthPercentilesReport(df: DataFrame, source: Column,
      text: Column, pcts: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p > 0.0 && p <= 1.0),
      s"lengthPercentilesReport: quantiles must be in (0,1], got $pcts")
    // the "p99.9" label rounds to one decimal of percent — distinct
    // requested quantiles that collide after rounding (0.999 vs
    // 0.9994, or 0.9995 labeling as p100) would emit identically
    // labeled rows; reject at the API rather than mislabel
    require(pcts.map(p => math.round(p * 1000)).distinct.size == pcts.size,
      s"lengthPercentilesReport: quantile labels collide after 1-decimal rounding: $pcts")
    val n = size(filter(tokens(text), t => t =!= "")).cast("long")
    val counts = df.select(source.as("source"), n.as("token_len"))
      .groupBy(col("source"), col("token_len"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col("source")).orderBy(col("token_len"))
    val cum = counts.withColumn("__cum", sum(col("__c")).over(w))
    val totals = counts.groupBy(col("source"))
      .agg(sum(col("__c")).as("n_docs"))
    // label "p50"/"p99.9": fixed decimal then strip the trailing .0 —
    // deterministic strings, no double-format locale surprises
    val labeled = cum.join(totals, Seq("source"))
      .select(col("*"),
        explode(array(pcts.map(lit(_).cast("double")): _*)).as("__p"))
      .withColumn("__target", ceil(col("__p") * col("n_docs")))
    labeled
      .filter(col("__cum") >= col("__target") &&
        col("__cum") - col("__c") < col("__target"))
      .select(col("source"),
        concat(lit("p"), regexp_replace(
          format_number(col("__p") * 100, 1), "\\.0$", "")).as("pct"),
        col("n_docs"), col("token_len"))
  }

  /** EXACT Heaps-law vocabulary-growth curve: distinct vocabulary
    * after each 1/K of the token stream (documents laid end to end in
    * id order). Natural corpora grow ~N^β with β≈0.5 — a curve that
    * flattens early signals template/duplicated text, one that stays
    * near-linear signals OCR noise or concatenated garbage; the same
    * diagnostic family as `zipfReport`/`hapaxReport` but over STREAM
    * ORDER, so it also reveals when a sorted-by-source corpus stops
    * contributing new vocabulary.
    *
    * Exact in ONE pass over the tokens — no per-checkpoint rescan: a
    * word's contribution to every checkpoint is determined by its
    * FIRST global position alone, so the curve is a cumulative sum
    * over first-occurrence buckets. Global token positions come from
    * the two-phase distributed prefix sum (`Packing.packByTokenBudget`
    * — no single-task window); first positions are one (word, min)
    * aggregation with map-side combine; the bucket cumsum runs over
    * ≤ K rows. Checkpoint k covers tokens [0, ceil(N·k/K)), which is
    * exactly bucket(p) = p·K div N < k — integer arithmetic both here
    * and in the oracle, no float thresholds. The token arrays ride the
    * one range shuffle the prefix sum already pays (1× corpus volume,
    * the q77-rebuild allowance). */
  def heapsCurve(df: DataFrame, id: String, text: Column,
      checkpoints: Int = 20): DataFrame = {
    require(checkpoints >= 1, s"heapsCurve: checkpoints=$checkpoints")
    val toks = df.select(col(id), filter(tokens(text), t => t =!= "").as("__ws"))
      .withColumn("__n", size(col("__ws")).cast("long"))
    val prefixed = Packing.packByTokenBudget(toks, Seq(col(id)),
        col("__n"), Long.MaxValue)
      .select(col("__ws"), col("prefix_tokens"))
    val firsts = prefixed
      .select(posexplode(col("__ws")).as(Seq("__i", "__w")),
        col("prefix_tokens"))
      .select(col("__w"), (col("prefix_tokens") + col("__i")).as("__p"))
      .groupBy(col("__w")).agg(min(col("__p")).as("__fp"))
    val totalDf = toks.agg(sum(col("__n")).as("__N"))
    val buckets = firsts.crossJoin(broadcast(totalDf))
      .select(expr(s"(__fp * $checkpoints) div __N").as("__b"))
      .groupBy(col("__b")).agg(count(lit(1)).as("__cnt"))
    // dense k = 1..K spine; both sides of the b < k join are ≤ K rows
    val spine = df.sparkSession.range(1, checkpoints + 1L)
      .toDF("checkpoint").crossJoin(broadcast(totalDf))
    spine.join(buckets, col("__b") < col("checkpoint"), "left")
      .groupBy(col("checkpoint"), col("__N"))
      .agg(coalesce(sum(col("__cnt")), lit(0L)).as("vocab"))
      .select(col("checkpoint"),
        expr(s"(__N * checkpoint + ${checkpoints - 1}) div $checkpoints")
          .as("tokens_seen"),
        col("vocab"))
  }

  /** Tokenizer fertility per group: whitespace words vs BPE-ish
    * subword tokens vs characters — the table that prices a tokenizer
    * choice per source before committing a 100 TB tokenization run
    * (fertility = subwords per word; chars_per_token = compression).
    * High-fertility sources (code, non-Latin scripts, URL-heavy crawl)
    * dominate the token budget at constant document share — this is
    * where that shows up first. Counts are exact integers from the
    * engine's two pinned token counters (q23's ws/bpe definitions
    * verbatim); the two ratios are the only rounded values.
    *
    * Scale: pure map-side projection + one group aggregation —
    * |groups| rows end to end, no join, no window. */
  def tokenizerFertilityReport(df: DataFrame, group: Column,
      text: Column, roundTo: Int = 6): DataFrame =
    df.select(group.as("group"),
        size(filter(NearDup.tokens(text), t => t =!= ""))
          .cast("long").as("__w"),
        TextAnalysis.bpeTokenCount(text).as("__b"),
        length(text).cast("long").as("__c"))
      .groupBy(col("group"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__w")).as("words"),
        sum(col("__b")).as("bpe_tokens"), sum(col("__c")).as("chars"))
      .select(col("group"), col("n_docs"), col("words"), col("bpe_tokens"),
        col("chars"),
        // try_divide: an all-empty group yields NULL ratios, not an
        // ANSI DIVIDE_BY_ZERO that kills the whole report (DuckDB's
        // divide returns NULL on a zero divisor — same contract)
        round(try_divide(col("bpe_tokens").cast("double"), col("words")),
          roundTo).as("fertility"),
        round(try_divide(col("chars").cast("double"), col("bpe_tokens")),
          roundTo).as("chars_per_token"))

  /** Gate-threshold calibration sweep: for each candidate threshold,
    * how many of each group's rows a score gate would keep — the table
    * you read BEFORE applying a corpus-wide quality gate (CCNet's
    * perplexity buckets, C4's langid cut, an NB-classifier score cut),
    * where "keep 60% of source A but 4% of source B" is the decision
    * that actually matters. `keepBelow=false` keeps score ≥ t (higher
    * is better, classifier posteriors); `keepBelow=true` keeps
    * score ≤ t (lower is better, negative-log-likelihood scales).
    *
    * Null scores count in `n_docs` but never in `n_kept` — a doc the
    * scorer refused to score does not pass any gate, and dropping it
    * from the denominator would overstate keep rates.
    *
    * Scale: the per-row explode is over the constant threshold grid
    * (the `truncationLossReport` pattern) and partial aggregation
    * collapses everything to |groups|·|thresholds| rows before the one
    * exchange — no join, no window, no row-proportional shuffle.
    *
    * Output: group, threshold, n_docs, n_kept, keep_rate (rounded 6),
    * one row per (group, threshold) — dense: every group reports every
    * threshold.
    */
  def thresholdSweep(df: DataFrame, group: Column, score: Column,
      thresholds: Seq[Double], keepBelow: Boolean = false,
      roundTo: Int = 6): DataFrame = {
    require(thresholds.nonEmpty, "thresholdSweep: need at least one threshold")
    val pass =
      if (keepBelow) col("__s") <= col("threshold")
      else col("__s") >= col("threshold")
    df.select(group.as("group"), score.as("__s"),
        explode(array(thresholds.map(lit(_)): _*)).as("threshold"))
      .groupBy(col("group"), col("threshold"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(when(pass, 1L).otherwise(0L)), lit(0L)).as("n_kept"))
      .select(col("group"), col("threshold"), col("n_docs"), col("n_kept"),
        round(col("n_kept").cast("double") / col("n_docs"), roundTo)
          .as("keep_rate"))
  }
}
