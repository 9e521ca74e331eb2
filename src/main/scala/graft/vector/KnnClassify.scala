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
  * Shape: the query sample broadcasts into a nested-loop scoring pass
  * against the corpus (Q·N multiplies — exact by definition, which is
  * why it takes a query SAMPLE, the `RecallReport.exactTopK`
  * treatment); per-query top-k is a row_number window keyed on the
  * query id (fine at sample cardinality; a million-query eval would
  * ride the IVF cell join instead — `Ivf.ivfTopK`). Votes are a tiny
  * (qid, label) hash agg; ties break deterministically (higher count
  * first, then smaller label), as does the top-k boundary (round-6
  * score desc, neighbor id asc — `Similarity.topK`'s discipline).
  *
  * Output: (id, true_label, pred_label, n_votes, correct), one row
  * per query, ordered by id.
  */
object KnnClassify {

  def knnClassify(corpus: DataFrame, id: String, vec: String,
      label: String, queries: DataFrame, k: Int): DataFrame = {
    require(k > 0, "knnClassify: k must be positive")
    val q = broadcast(queries.select(col(id).as("__qid"),
      col(vec).as("__qv"), col(label).as("__tl")))
    val scored = corpus.crossJoin(q)
      .filter(col(id) =!= col("__qid")) // leave-one-out
      .select(col("__qid"), col("__tl"), col(id).as("__nid"),
        col(label).as("__nl"),
        round(Similarity.cosineSim(col(vec), col("__qv")), 6).as("__sc"))
    val topW = Window.partitionBy("__qid").orderBy(desc("__sc"), col("__nid"))
    val top = scored.withColumn("__rn", row_number().over(topW))
      .filter(col("__rn") <= k)
    val votes = top.groupBy(col("__qid"), col("__tl"), col("__nl"))
      .agg(count(lit(1)).as("n_votes"))
    val voteW = Window.partitionBy("__qid").orderBy(desc("n_votes"), col("__nl"))
    votes.withColumn("__pr", row_number().over(voteW))
      .filter(col("__pr") === 1)
      .select(col("__qid").as(id), col("__tl").as("true_label"),
        col("__nl").as("pred_label"), col("n_votes"),
        (col("__nl") === col("__tl")).as("correct"))
      .orderBy(col(id))
  }
}
