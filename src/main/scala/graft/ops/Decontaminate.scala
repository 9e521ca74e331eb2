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

  /** Source × benchmark contamination MATRIX — the table a corpus
    * release publishes (per source: how many documents share ≥
    * `minShared` word n-grams with each eval benchmark). Dense: every
    * (source, benchmark) cell is present, zero or not, so the matrix
    * reads without an implicit-missing convention.
    *
    * Scale: one `contaminationReport` per benchmark (benchmarks are a
    * small constant; each is the bounded shingle equi-join), unioned
    * with a literal benchmark tag, then one (source, benchmark)
    * rollup against the corpus metadata; the dense frame comes from a
    * sources × benchmarks cross of two tiny distinct sets. */
  def contaminationMatrix(corpus: DataFrame, id: String, text: Column,
      source: Column, benchmarks: Seq[(String, DataFrame)],
      benchText: Column, n: Int = 3, minShared: Long = 1): DataFrame = {
    require(benchmarks.nonEmpty, "contaminationMatrix: no benchmarks")
    val meta = corpus.select(col(id), source.as("source"))
    val hits = benchmarks.map { case (name, bench) =>
      contaminationReport(corpus, id, text, bench, benchText, n)
        .filter(col("n_shared") >= minShared)
        .select(col(id), lit(name).as("benchmark"))
    }.reduce(_.unionByName(_))
    val counts = hits.join(meta, Seq(id))
      .groupBy(col("source"), col("benchmark"))
      .agg(count(lit(1)).as("contaminated_docs"))
    val totals = meta.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val benchNames = benchmarks.map(_._1)
    val dense = totals.select(col("source"), col("n_docs"),
      explode(array(benchNames.map(lit(_)): _*)).as("benchmark"))
    dense.join(counts, Seq("source", "benchmark"), "left")
      .select(col("source"), col("benchmark"), col("n_docs"),
        coalesce(col("contaminated_docs"), lit(0L)).as("contaminated_docs"))
  }

  /** Cross-split exact-content leakage audit: test-split documents
    * whose content fingerprint (sha16 of the raw text) also appears in
    * the train split, with the train-side copy count — the check that
    * a hash split didn't leak duplicated content across the boundary
    * (exact dups land in INDEPENDENT splits when the split key is the
    * id, which is why split-after-dedup is the rule; this measures
    * the damage when it isn't). Output: `(id, n_train_dups)` per
    * leaking test doc; clean docs absent.
    *
    * Scale shape: one hash per row on each side, map-side-combining
    * count on the train fingerprints, equi-join on the 16-hex key —
    * the same shape as `contaminationReport` with the shingle explode
    * replaced by one fingerprint per document. */
  def splitLeakageReport(train: DataFrame, test: DataFrame, id: String,
      text: Column): DataFrame = {
    val fp = graft.expr.Functions.sha16(text)
    val trainFp = train.select(fp.as("__fp"))
      .groupBy(col("__fp")).agg(count(lit(1)).as("n_train_dups"))
    test.select(col(id), fp.as("__fp"))
      .join(trainFp, "__fp")
      .select(col(id), col("n_train_dups"))
  }

  /** Semantic cross-split leakage: (train_id, test_id, cos_sim) pairs
    * whose embeddings are cosine-close — the paraphrase/translation
    * leakage that neither the n-gram report nor the exact-fingerprint
    * audit can see (a reworded benchmark question shares no 3-gram
    * and no sha16 with its source). Candidates come from a shared
    * [[graft.vector.Quantizer]] cell assignment over BOTH splits —
    * build the quantizer on the union so train and test land in the
    * same cell space — making this the SemDeDup candidate structure
    * pointed across a split boundary: one equi-join on the cell id,
    * pairwise cosine bounded by cell size, never train × test.
    * Same recall dial as semantic dedup (cells miss boundary pairs;
    * tighten with smaller cells / multi-probe). Rows with null
    * vectors drop out (null cell joins nothing). */
  def semanticLeakage(train: DataFrame, test: DataFrame, id: String,
      vec: String, quant: graft.vector.Quantizer,
      threshold: Double): DataFrame = {
    val a = quant.attach(train.select(col(id), col(vec)), col(vec))
      .select(col("ivf_cell"), col(id).as("train_id"), col(vec).as("__va"))
    val b = quant.attach(test.select(col(id), col(vec)), col(vec))
      .select(col("ivf_cell"), col(id).as("test_id"), col(vec).as("__vb"))
    val cos = graft.vector.Similarity.cosineSim(col("__va"), col("__vb"))
    a.join(b, Seq("ivf_cell"))
      .filter(cos >= threshold)
      .select(col("train_id"), col("test_id"), round(cos, 6).as("cos_sim"))
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
