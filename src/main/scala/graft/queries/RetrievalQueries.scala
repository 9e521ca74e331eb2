package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{Bm25, Fusion}
import graft.vector.Similarity
import Q.t

/** Hybrid-retrieval queries: rank fusion over the lexical (BM25) and
  * vector (cosine) rankers, and MMR diversified re-ranking — the
  * serving tail that combines the engine's two retrieval halves.
  */
object RetrievalQueries {

  private def queryVec(s: org.apache.spark.sql.SparkSession, d: String,
      id: Long): Array[Float] =
    t(s, d, "embeddings").filter(col("vec_id") === id)
      .select(col("embedding")).head().getSeq[Float](0).toArray

  val qs: Seq[Q] = Seq(

    // ---- Reciprocal Rank Fusion of BM25 ⊕ cosine pools ----
    // Lexical pool: q91's BM25 top-50 over documents; vector pool:
    // q18's exact-cosine top-50 over embeddings (query = vec 0); both
    // pre-rounded to 6dp so pool ranks reproduce across engines. RRF
    // k=60 (the Cormack et al. default), fused top-20. A doc missing
    // from one pool contributes nothing for that ranker — n_rankers
    // records how many pools carried it.
    Q("q105_rrf_fusion",
      """WITH dl AS (SELECT doc_id,
        |  len(string_split_regex(lower(trim(text)), '\s+')) AS dl FROM documents),
        |tot AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |tok AS (SELECT doc_id,
        |  unnest(string_split_regex(lower(trim(text)), '\s+')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
        | WHERE term IN ('dup','vector','hash') GROUP BY doc_id, term),
        |dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |bm AS (SELECT tf.doc_id,
        |  round(SUM(ln(1.0 + (n_docs - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)))
        |    * tf * (CAST(1.2 AS DOUBLE) + 1.0)
        |    / (tf + CAST(1.2 AS DOUBLE)
        |       * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / avgdl))), 6) AS score
        | FROM tf JOIN dfr USING (term) JOIN dl USING (doc_id), tot
        | GROUP BY tf.doc_id),
        |lexpool AS (SELECT doc_id, score FROM bm ORDER BY score DESC, doc_id LIMIT 50),
        |lr AS (SELECT doc_id,
        |  row_number() OVER (ORDER BY score DESC, doc_id) AS rl FROM lexpool),
        |u AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |       generate_subscripts(embedding, 1) AS i FROM embeddings),
        |q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS qx,
        |       generate_subscripts(embedding, 1) AS i FROM embeddings WHERE vec_id = 0),
        |cs AS (SELECT vec_id AS doc_id,
        |  round(SUM(x*qx) / (sqrt(SUM(x*x)) * sqrt(SUM(qx*qx))), 6) AS score
        | FROM u JOIN q USING (i) GROUP BY vec_id),
        |sempool AS (SELECT doc_id, score FROM cs ORDER BY score DESC, doc_id LIMIT 50),
        |sr AS (SELECT doc_id,
        |  row_number() OVER (ORDER BY score DESC, doc_id) AS rs FROM sempool)
        |SELECT coalesce(lr.doc_id, sr.doc_id) AS doc_id,
        | round(coalesce(1.0/(60+rl), 0) + coalesce(1.0/(60+rs), 0), 6) AS rrf_score,
        | (CASE WHEN rl IS NOT NULL THEN 1 ELSE 0 END
        |  + CASE WHEN rs IS NOT NULL THEN 1 ELSE 0 END) AS n_rankers
        |FROM lr FULL OUTER JOIN sr ON lr.doc_id = sr.doc_id
        |ORDER BY rrf_score DESC, doc_id LIMIT 20""".stripMargin) { (s, d) =>
      val lex = Bm25.bm25TopK(t(s, d, "documents"), "doc_id", col("text"),
          Seq("dup", "vector", "hash"), k = 50)
        .select(col("doc_id"), col("score"))
      val sem = Similarity.topK(t(s, d, "embeddings"), "vec_id", "embedding",
          queryVec(s, d, 0), 50)
        .withColumnRenamed("vec_id", "doc_id")
      Fusion.reciprocalRankFusion(Seq(lex, sem), "doc_id", k = 60, topK = 20)
        .orderBy(col("rrf_score").desc, col("doc_id"))
    },

    // ---- MMR diversified re-rank of a cosine pool ----
    // Non-SQL-expressible (the greedy is sequential); FusionSpec pins
    // the semantics (near-dup suppression, lambda extremes, ties) and
    // the driver records the rows-only check. Pool = exact-cosine
    // top-30 for query vec 0, re-ranked to 10 at lambda 0.7.
    // The general-λ greedy, FULL-HASH (r19 — previously rows-only):
    // the selection loop unrolls into one materialized CTE per pick
    // (the BPE training-oracle discipline), and both engines snap the
    // argmax objective 0.7·rel − 0.3·max-cos to the round-6 grid
    // (`objectiveGrid`) — rel's bits are engine-identical already
    // (round-6 cosine), so only the redundancy term's ~1e-15
    // summation-order noise rides under a 5e-7 half-grid. The 30×30
    // pool cosine matrix is computed once; step k argmaxes over the
    // unpicked rows against the picked set, ties to the smaller id.
    Q("q111_mmr_rerank", mmrOracle(30, 10)) { (s, d) =>
      val emb = t(s, d, "embeddings")
      val pool = Similarity.topK(emb, "vec_id", "embedding",
          queryVec(s, d, 0), 30)
        .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      Fusion.mmrRerank(pool, "vec_id", "embedding", lambda = 0.7, k = 10,
          objectiveGrid = Some(6))
        .orderBy(col("mmr_rank"))
    },

    // ---- MMR at lambda=1: greedy degenerates to pure-relevance top-k ----
    // The general greedy (q111) is rows-only by contract; at lambda=1
    // the redundancy term vanishes, the selection IS top-k by
    // (score desc, id asc), and the same code path — pool collect,
    // greedy loop, tie-break — gets a full hash oracle for free.
    Q("q137_mmr_lambda1",
      """WITH u AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |       generate_subscripts(embedding, 1) AS i FROM embeddings),
        |q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS qx,
        |       generate_subscripts(embedding, 1) AS i FROM embeddings WHERE vec_id = 0),
        |cs AS (SELECT vec_id,
        |  round(SUM(x*qx) / (sqrt(SUM(x*x)) * sqrt(SUM(qx*qx))), 6) AS score
        | FROM u JOIN q USING (i) GROUP BY vec_id),
        |pool AS (SELECT vec_id, score FROM cs ORDER BY score DESC, vec_id LIMIT 30)
        |SELECT vec_id, row_number() OVER (ORDER BY score DESC, vec_id) AS mmr_rank,
        |       score
        |FROM pool ORDER BY mmr_rank LIMIT 10""".stripMargin) { (s, d) =>
      val emb = t(s, d, "embeddings")
      val pool = Similarity.topK(emb, "vec_id", "embedding",
          queryVec(s, d, 0), 30)
        .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      Fusion.mmrRerank(pool, "vec_id", "embedding", lambda = 1.0, k = 10)
        .orderBy(col("mmr_rank"))
    },

    // ---- distributed MMR page: cluster-prune pre-stage, lambda=1 ----
    // The CORPUS-sized pool (every embedding scored against query
    // vec 0 — 500 rows at sf0.01, 2000 at sf0.1, always > maxPool=360)
    // forces mmrRerankLarge's LSH-cell prune: 8 hyperplane cells (+1
    // null cell) each keep their top-40 by (score, id) map-side, the
    // bounded page feeds the exact greedy. At lambda=1 the prune is
    // EXACT for any pool (the page provably contains the global
    // relevance top-k), so the scale path gets a full hash oracle:
    // top-10 by (score desc, vec_id). PropertySpec pins the ≤maxPool
    // passthrough and the lambda=1 pruned==unpruned guarantee.
    Q("q138_mmr_large",
      """WITH u AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |       generate_subscripts(embedding, 1) AS i FROM embeddings),
        |q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS qx,
        |       generate_subscripts(embedding, 1) AS i FROM embeddings WHERE vec_id = 0),
        |cs AS (SELECT vec_id,
        |  round(SUM(x*qx) / (sqrt(SUM(x*x)) * sqrt(SUM(qx*qx))), 6) AS score
        | FROM u JOIN q USING (i) GROUP BY vec_id)
        |SELECT vec_id, row_number() OVER (ORDER BY score DESC, vec_id) AS mmr_rank,
        |       score
        |FROM cs WHERE score IS NOT NULL AND NOT isnan(score)
        |ORDER BY mmr_rank LIMIT 10""".stripMargin) { (s, d) =>
      // the oracle's NaN/NULL guard mirrors mmrRerankLarge's explicit
      // unrankable-row drop: a zero-norm embedding scores NaN, which
      // DuckDB's ORDER BY DESC would sort FIRST while Spark drops it —
      // the two sides must share the drop semantics by construction,
      // not by the generated data happening to have no zero-norm rows
      val emb = t(s, d, "embeddings")
      val q = queryVec(s, d, 0)
      val pool = emb.select(col("vec_id"),
        round(Similarity.cosineSim(col("embedding"), typedlit(q.toSeq)), 6)
          .as("score"),
        col("embedding"))
      Fusion.mmrRerankLarge(pool, "vec_id", "embedding", lambda = 1.0,
          k = 10, maxPool = 360, nPlanes = 3)
        .orderBy(col("mmr_rank"))
    },

    // ---- MMR prune-quality audit, lambda=1 row ----
    // q138's FORCED prune measured instead of asserted: the report
    // runs the exact greedy on the full pool and on the pruned page
    // for each lambda in the grid and emits their top-k overlap. The
    // lambda=1 row is SQL-expressible end-to-end — the containment
    // guarantee (every cell's top-perCell includes the global
    // relevance top-k) makes overlap_at_k exactly 1.0, and pool_n is
    // the rankable-row count — so the audit op itself gets a full
    // hash oracle. The lambda<1 rows (approximation quality, no
    // closed form) are pinned by FusionSpec's planted near-dup pool;
    // page_n is LSH-cell-dependent and checked there too (page_n <
    // pool_n under a forced cut).
    Q("q139_mmr_prune_quality",
      """WITH u AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |       generate_subscripts(embedding, 1) AS i FROM embeddings),
        |q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS qx,
        |       generate_subscripts(embedding, 1) AS i FROM embeddings WHERE vec_id = 0),
        |cs AS (SELECT vec_id,
        |  round(SUM(x*qx) / (sqrt(SUM(x*x)) * sqrt(SUM(qx*qx))), 6) AS score
        | FROM u JOIN q USING (i) GROUP BY vec_id)
        |SELECT CAST(1.0 AS DOUBLE) AS lambda, CAST(10 AS INTEGER) AS k,
        |       CAST(count(*) AS BIGINT) AS pool_n,
        |       CAST(1.0 AS DOUBLE) AS overlap_at_k
        |FROM cs WHERE score IS NOT NULL AND NOT isnan(score)""".stripMargin) { (s, d) =>
      val emb = t(s, d, "embeddings")
      val q = queryVec(s, d, 0)
      val pool = emb.select(col("vec_id"),
        round(Similarity.cosineSim(col("embedding"), typedlit(q.toSeq)), 6)
          .as("score"),
        col("embedding"))
      // maxEval 30000 keeps the audit runnable at sf1 (20k embeddings)
      Fusion.mmrPruneQualityReport(pool, "vec_id", "embedding",
          lambdas = Seq(0.7, 1.0), k = 10, maxPool = 360, nPlanes = 3,
          maxEval = 30000)
        .filter(col("lambda") === 1.0)
        .select(col("lambda"), col("k"), col("pool_n"), col("overlap_at_k"))
    },
  )

  /** q111's oracle: the λ=0.7 MMR greedy over the top-`poolN` cosine
    * pool, unrolled into one materialized CTE per pick. `cm` is the
    * pool's cosine matrix (unrounded doubles — the engine greedy's
    * exact arithmetic); each step's argmax orders by the ROUND-6
    * objective (+ 0.0: the engine's BigDecimal snap never yields -0.0,
    * and DuckDB's sort keys -0.0 below +0.0 — the suite-wide
    * signed-zero convention applied to an ORDERING key) then id,
    * mirroring `objectiveGrid = Some(6)`. */
  private def mmrOracle(poolN: Int, k: Int): String = {
    val head =
      s"""u AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
         |      generate_subscripts(embedding, 1) AS i FROM embeddings),
         |q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS qx,
         |      generate_subscripts(embedding, 1) AS i
         |      FROM embeddings WHERE vec_id = 0),
         |cs AS (SELECT vec_id,
         |  round(SUM(x*qx) / (sqrt(SUM(x*x)) * sqrt(SUM(qx*qx))), 6) AS rel
         | FROM u JOIN q USING (i) GROUP BY vec_id),
         |pool AS MATERIALIZED (SELECT vec_id, rel FROM cs
         |  ORDER BY rel DESC, vec_id LIMIT $poolN),
         |pu AS (SELECT u.vec_id, u.x, u.i FROM u
         |  JOIN pool ON pool.vec_id = u.vec_id),
         |nrm AS (SELECT vec_id, sqrt(SUM(x*x)) AS nrm FROM pu GROUP BY vec_id),
         |cm AS MATERIALIZED (SELECT a.vec_id AS ia, b.vec_id AS ib,
         |  SUM(a.x * b.x) / (na.nrm * nb.nrm) AS cs
         |  FROM pu a JOIN pu b ON b.i = a.i
         |  JOIN nrm na ON na.vec_id = a.vec_id
         |  JOIN nrm nb ON nb.vec_id = b.vec_id
         |  GROUP BY a.vec_id, b.vec_id, na.nrm, nb.nrm),
         |s1 AS MATERIALIZED (SELECT vec_id, 1 AS mmr_rank, rel FROM pool
         |  ORDER BY round(0.7 * rel, 6) + 0.0 DESC, vec_id LIMIT 1)""".stripMargin
    val steps = (2 to k).map { j =>
      s"""p$j AS MATERIALIZED (
         |  SELECT vec_id, $j AS mmr_rank, rel FROM (
         |    SELECT c.vec_id, c.rel, max(m.cs) AS red
         |    FROM pool c JOIN cm m ON m.ia = c.vec_id
         |    JOIN s${j - 1} p ON p.vec_id = m.ib
         |    WHERE c.vec_id NOT IN (SELECT vec_id FROM s${j - 1})
         |    GROUP BY c.vec_id, c.rel)
         |  ORDER BY round(0.7 * rel - 0.3 * red, 6) + 0.0 DESC, vec_id LIMIT 1),
         |s$j AS MATERIALIZED (
         |  SELECT * FROM s${j - 1} UNION ALL SELECT * FROM p$j)""".stripMargin
    }
    s"""WITH ${(head +: steps).mkString(",\n")}
       |SELECT vec_id, CAST(mmr_rank AS BIGINT) AS mmr_rank, rel AS score
       |FROM s$k ORDER BY mmr_rank""".stripMargin
  }
}
