package graft.queries

import org.apache.spark.sql.functions._
import graft.vector.{Embed, HashEmbedder, Similarity}
import Q.t

/** Similarity-search / embedding queries (SURVEY.md §2.10).
  * q18 is oracle-checked (double-precision unnest reduction in DuckDB);
  * the hash-embedder and LSH-ANN paths are JVM-hash based → rows-only
  * driver check, with recall/parity covered in ScalaTest instead.
  */
object VectorQueries {

  /** One-row driver-side lookup of the query vector — the "query" is
    * an input parameter, not dataflow. */
  private def queryVec(s: org.apache.spark.sql.SparkSession, d: String,
      id: Long): Array[Float] =
    t(s, d, "embeddings").filter(col("vec_id") === id)
      .select(col("embedding")).head().getSeq[Float](0).toArray

  val qs: Seq[Q] = Seq(

    // ---- exact brute-force cosine top-k (codegen'd kernel) ----
    Q("q18_cosine_topk",
      """WITH u AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |       generate_subscripts(embedding, 1) AS i FROM embeddings),
        |q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS qx,
        |       generate_subscripts(embedding, 1) AS i FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id,
        | round(SUM(x*qx) / (sqrt(SUM(x*x)) * sqrt(SUM(qx*qx))), 6) AS score
        |FROM u JOIN q USING (i) GROUP BY vec_id
        |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin) { (s, d) =>
      Similarity.topK(t(s, d, "embeddings"), "vec_id", "embedding",
        queryVec(s, d, 0), 10)
    },

    // ---- feature-hash embedding of the documents table (V1 stub) ----
    Q.noOracle("q19_embed_hash") { (s, d) =>
      val embedded = Embed.withEmbedding(
        t(s, d, "documents"), col("text"), new HashEmbedder(dim = 64))
      embedded.select(col("doc_id"), col("embedding"),
          round(Similarity.cosineSim(col("embedding"), col("embedding")), 3).as("self_cos"))
        .orderBy(col("doc_id"))
    },

    // ---- LSH-bucketed approximate nearest neighbors ----
    // 4 planes + hamming-1 multiprobe scans 5/16 of the corpus; plane
    // count is the recall/cost dial (more planes → finer pruning, needs
    // clustered embeddings to keep recall — testdata vectors are random).
    Q.noOracle("q20_ann_lsh") { (s, d) =>
      Similarity.annTopK(t(s, d, "embeddings"), "vec_id", "embedding",
        queryVec(s, d, 0), 10, nPlanes = 4)
    },
  )
}
