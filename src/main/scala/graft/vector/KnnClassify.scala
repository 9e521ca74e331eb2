package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-NN majority-vote classification over an embedding column — the
  * label-propagation / quality-classifier eval of a training-data
  * pipeline (e.g. scoring documents by the labels of their nearest
  * labeled neighbors before training a fast classifier on the result).
  * Leave-one-out: a query never votes for itself, so running the
  * corpus's own labeled rows as queries yields an honest accuracy
  * estimate of "would a k-NN rule reproduce these labels".
  *
  * Two paths, one vote tail:
  *  - `knnClassify` — EXACT: the query sample broadcasts into a
  *    nested-loop scoring pass against the corpus (Q·N multiplies —
  *    exact by definition, which is why it takes a query SAMPLE, the
  *    `RecallReport.exactTopK` treatment).
  *  - `knnClassifyCells` — the scale path: candidates come from the
  *    shared IVF cell join (`SemDedup.knnGraph`), so EVERY corpus row
  *    classifies at O(N·cell) cost instead of O(N²); boundary
  *    neighbors are missed by construction (the SemDeDup recall dial).
  *
  * Determinism in both: per-query top-k by (round-6 score desc,
  * neighbor id asc) — `Similarity.topK`'s discipline — and vote ties
  * break (count desc, label asc).
  *
  * Output: (id, true_label, pred_label, n_votes, correct), one row
  * per query, ordered by id.
  */
object KnnClassify {

  /** Vote tail shared by both paths: `neighbors` carries one row per
    * (query, voting neighbor) as (id, __tl, __nl). The (id, label)
    * agg is tiny (≤ k rows per query pre-combine); the vote-rank
    * window reuses the same id partitioning. */
  private def majorityVote(neighbors: DataFrame, id: String): DataFrame = {
    val votes = neighbors.groupBy(col(id), col("__tl"), col("__nl"))
      .agg(count(lit(1)).as("n_votes"))
    val voteW = Window.partitionBy(col(id)).orderBy(desc("n_votes"), col("__nl"))
    votes.withColumn("__pr", row_number().over(voteW))
      .filter(col("__pr") === 1)
      .select(col(id), col("__tl").as("true_label"),
        col("__nl").as("pred_label"), col("n_votes"),
        (col("__nl") === col("__tl")).as("correct"))
      .orderBy(col(id))
  }

  /** Exact leave-one-out k-NN vote for a (small, broadcastable) query
    * sample. A map-side `WindowGroupLimit` prunes to ≤ k rows per
    * partition per query before the single qid exchange. */
  def knnClassify(corpus: DataFrame, id: String, vec: String,
      label: String, queries: DataFrame, k: Int): DataFrame = {
    require(k > 0, "knnClassify: k must be positive")
    val q = broadcast(queries.select(col(id).as("__qid"),
      col(vec).as("__qv"), col(label).as("__tl")))
    val scored = corpus.crossJoin(q)
      .filter(col(id) =!= col("__qid")) // leave-one-out
      .select(col("__qid"), col("__tl"), col(label).as("__nl"),
        col(id).as("__nid"),
        round(Similarity.cosineSim(col(vec), col("__qv")), 6).as("__sc"))
    val topW = Window.partitionBy("__qid").orderBy(desc("__sc"), col("__nid"))
    val top = scored.withColumn("__rn", row_number().over(topW))
      .filter(col("__rn") <= k)
      .select(col("__qid").as(id), col("__tl"), col("__nl"))
    majorityVote(top, id)
  }

  /** Cell-bounded leave-one-out k-NN vote for the WHOLE corpus: the
    * candidate set is the query's own IVF cell (`SemDedup.knnGraph`'s
    * equi-join on the quantizer cell — no all-pairs), so total work is
    * O(N·cell size) and every stage shuffles ids + one int label, not
    * vectors or text. Rows in singleton cells have no candidates and
    * emit no row (same contract as `knnGraph`). The two label joins
    * are keyed on the 8-byte id. */
  def knnClassifyCells(corpus: DataFrame, id: String, vec: String,
      label: String, quant: Quantizer, k: Int): DataFrame = {
    require(k > 0, "knnClassifyCells: k must be positive")
    val labels = corpus.select(col(id), col(label))
    val top = SemDedup.knnGraph(corpus, id, vec, quant, k)
      .select(col(id), col("neighbor"))
    val withNl = top.join(
      labels.select(col(id).as("neighbor"), col(label).as("__nl")),
      Seq("neighbor"))
    val withBoth = withNl.join(
      labels.select(col(id), col(label).as("__tl")), Seq(id))
      .select(col(id), col("__tl"), col("__nl"))
    majorityVote(withBoth, id)
  }

  /** Confusion matrix over a classification report (either path):
    * (true_label, pred_label, n, share) where share is the row's
    * fraction of its true-label total — the per-class recall
    * diagonal. One tiny labels² hash agg plus a per-true-label
    * window over at most |labels|² rows. */
  def confusionMatrix(report: DataFrame): DataFrame = {
    val counts = report.groupBy(col("true_label"), col("pred_label"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("true_label")
    counts
      .select(col("true_label"), col("pred_label"), col("n"),
        round(col("n") / sum("n").over(w), 6).as("share"))
      .orderBy(col("true_label"), col("pred_label"))
  }
}
