package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import NearDup.tokens

/** DSIR-style data selection via importance resampling (Xie et al.
  * 2023, arXiv:2302.03169): score every document of a RAW crawl by
  * how much more likely its tokens are under a TARGET corpus's
  * unigram distribution than under the raw corpus's own — the
  * hashed-n-gram importance weight that selects "looks like the
  * target domain" training data from a general crawl. The engine
  * keeps the estimator at unigrams over the shared vocabulary with
  * add-one smoothing (deterministic, engine-reproducible; DSIR's
  * hashed bigrams are one `tokens` swap away) and returns the
  * per-document average log-likelihood ratio — rank/threshold/
  * Gumbel-top-k selection composes downstream.
  *
  * Scale shape (the `unigramLogProb` family, TextAnalysis.scala):
  * two map-side-combining frequency aggs (raw, target), one
  * vocab-sized full-outer join to line the distributions up, the
  * totals broadcast as one row, the token stream joins the scored
  * vocab on the term (AQE-broadcast while the vocab is small), and
  * the per-doc score is one hash agg. Every term linear in tokens;
  * no driver-side state beyond the one totals row.
  */
object Dsir {

  /** Per-raw-document importance score:
    * avg over tokens w of ln p̂_target(w) − ln p̂_raw(w), with
    * p̂(w) = (count(w) + 1) / (total + |V|) over the UNION vocabulary
    * (so unseen-in-target tokens penalize instead of exploding).
    * Output: (id, n_tokens, avg_llr), avg_llr rounded to 6 —
    * positive = looks more like the target than the crawl at large.
    */
  def importanceScores(raw: DataFrame, target: DataFrame, id: String,
      text: Column): DataFrame = {
    val rtok = raw.select(col(id), explode(tokens(text)).as("term"))
      .filter(col("term") =!= "")
    val ttok = target.select(explode(tokens(text)).as("term"))
      .filter(col("term") =!= "")
    val fr = rtok.groupBy(col("term")).agg(count(lit(1)).as("__nr"))
    val ft = ttok.groupBy(col("term")).agg(count(lit(1)).as("__nt"))
    val vocab = fr.join(ft, Seq("term"), "full_outer")
      .na.fill(0L, Seq("__nr", "__nt"))
    val tots = vocab.agg(sum(col("__nr")).as("__tr"),
      sum(col("__nt")).as("__tt"), count(lit(1)).as("__v"))
    val scored = vocab.crossJoin(broadcast(tots))
      .select(col("term"),
        (log((col("__nt") + lit(1.0)) / (col("__tt") + col("__v"))) -
          log((col("__nr") + lit(1.0)) / (col("__tr") + col("__v"))))
          .as("__llr"))
    rtok.join(scored, Seq("term"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(col("__llr")), 6).as("avg_llr"))
  }

  /** DSIR's sampling step, deterministically: Gumbel-top-k. Sampling
    * k documents WITHOUT replacement with probability ∝
    * exp(score / temperature) is equivalent to taking the top k of
    * score/T + Gumbel noise (the Gumbel-max trick); the noise comes
    * from a sha256-derived uniform of the document id, so the draw is
    * reproducible on any engine — no RNG state, no seed plumbing
    * (same construction as `Sampling`'s hash ordering and the LSH
    * hyperplanes). u = (h + 1)/(2³² + 1) with h the first 8 hex
    * digits of sha256("salt:id") keeps u strictly inside (0, 1).
    *
    * Scale shape: one map-side projection, then orderBy+limit —
    * Spark plans TakeOrderedAndProject (per-partition k-heaps, the
    * driver merges k·partitions rows); no global sort shuffle, no
    * single-partition window. Output: (id, sel_key) for the k
    * selected docs, sel_key rounded to 6. */
  def gumbelTopK(scores: DataFrame, id: String, score: Column, k: Int,
      temperature: Double = 1.0, salt: String = "dsir"): DataFrame = {
    require(k >= 1, "gumbelTopK: k must be >= 1")
    require(temperature > 0, "gumbelTopK: temperature must be > 0")
    val h = conv(substring(sha2(
        concat_ws(":", lit(salt), col(id).cast("string")), 256), 1, 8), 16, 10)
      .cast("long")
    val u = (h + lit(1.0)) / lit(4294967297.0)
    val key = score / lit(temperature) + -log(-log(u))
    scores.select(col(id), key.as("__key"))
      .orderBy(col("__key").desc, col(id))
      .limit(k)
      .select(col(id), round(col("__key"), 6).as("sel_key"))
  }
}
