package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
import org.apache.spark.sql.Row
import graft.vector.Pca
import Q.t

/** Embedding-decorrelation queries (the PCA/whitening layer of
  * SURVEY.md §2.10): the covariance face of the one-pass moments
  * kernel, the trace≡Σλ identity that pushes the driver-side
  * eigendecomposition through a SQL oracle, and a full-rank rotated
  * top-k whose oracle is computed in RAW space — distances only match
  * because the fitted basis is genuinely orthonormal.
  */
object PcaQueries {

  /** Shared oracle CTE: per-(vec_id, position) doubles. */
  private val unnestCte: String =
    """u AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
      |       generate_subscripts(embedding, 1) AS i
      |     FROM embeddings WHERE embedding IS NOT NULL),
      |n AS (SELECT count(*) AS n FROM embeddings WHERE embedding IS NOT NULL)""".stripMargin

  val qs: Seq[Q] = Seq(

    // ---- population covariance, upper triangle ----
    // Engine: two deterministic passes (means, then the centered
    // triangle); the oracle pays the explode-twice O(dim^2)
    // rows-per-vector formulation the engine exists to avoid.
    // BOTH sides are the corrected two-pass CENTERED form (r17
    // verdict): the uncentered E[xy]-E[x]E[y] cancels O(10-100) sums
    // to O(1e-4) answers, and the residual cross-engine float noise
    // (~1e-11) was the same order as this fixture's closest
    // round(.,6) midpoint gap — the hash was a measured coin flip.
    // Centered, the error is ~1e-15 against a 5e-7 half-grid
    // (headroom pinned in PcaSpec at all three SFs).
    Q("q150_embedding_covariance",
      s"""WITH $unnestCte,
         |m AS (SELECT i, SUM(x) / (SELECT n FROM n) AS mu FROM u GROUP BY i),
         |c AS (SELECT u.vec_id, u.i, u.x - m.mu AS cx
         |      FROM u JOIN m ON m.i = u.i),
         |cs AS (SELECT i, SUM(cx) AS cs FROM c GROUP BY i),
         |p AS (SELECT a.i AS i, b.i AS j, SUM(a.cx * b.cx) AS sxy
         |      FROM c a JOIN c b ON a.vec_id = b.vec_id AND a.i <= b.i
         |      GROUP BY a.i, b.i)
         |SELECT p.i AS i, p.j AS j,
         |  round(p.sxy / (SELECT n FROM n)
         |        - (ca.cs / (SELECT n FROM n)) * (cb.cs / (SELECT n FROM n)),
         |        6) AS cov
         |FROM p JOIN cs ca ON ca.i = p.i JOIN cs cb ON cb.i = p.j
         |ORDER BY i, j""".stripMargin) { (s, d) =>
      Pca.covariance(t(s, d, "embeddings"), "embedding")
        .withColumn("cov", round(col("cov"), 6))
    },

    // ---- trace identity: sum of eigenvalues == total variance ----
    // The oracle knows nothing of eigenvectors; it can still check the
    // eigendecomposition because tr(C) = sum(lambda) exactly. A wrong
    // solver, a dropped component, or a mis-ordered triangle index all
    // break the hash.
    Q("q151_pca_total_variance",
      s"""WITH $unnestCte,
         |v AS (SELECT i,
         |        SUM(x * x) / (SELECT n FROM n)
         |          - (SUM(x) / (SELECT n FROM n)) * (SUM(x) / (SELECT n FROM n)) AS pvar
         |      FROM u GROUP BY i)
         |SELECT (SELECT n FROM n) AS n_vectors,
         |       CAST(count(*) AS BIGINT) AS dim,
         |       round(SUM(pvar), 6) AS total_var
         |FROM v""".stripMargin) { (s, d) =>
      val model = Pca.fit(t(s, d, "embeddings"), "embedding")
      val schema = StructType(Seq(
        StructField("n_vectors", LongType, nullable = false),
        StructField("dim", LongType, nullable = false),
        StructField("total_var", DoubleType, nullable = false)))
      s.createDataFrame(
        s.sparkContext.parallelize(Seq(Row(model.n, model.dim.toLong,
          BigDecimal(model.eigenvalues.sum)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)), 1),
        schema)
    },

    // ---- full-rank rotation-invariance top-k ----
    // Engine scores euclidean top-k in PCA space; the oracle scores it
    // on the RAW embeddings. ||P(a-mu) - P(b-mu)|| = ||a-b|| iff P is
    // orthonormal, so the hash match IS the orthogonality proof —
    // robust to sign flips and degenerate-eigenvalue rotations, which
    // preserve distances too.
    Q("q152_pca_rotation_topk",
      """WITH u AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |       generate_subscripts(embedding, 1) AS i
        |     FROM embeddings WHERE embedding IS NOT NULL),
        |q AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS qx,
        |       generate_subscripts(embedding, 1) AS i
        |     FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id, round(sqrt(SUM((x - qx) * (x - qx))), 6) AS dist
        |FROM u JOIN q USING (i)
        |GROUP BY vec_id ORDER BY dist, vec_id LIMIT 10""".stripMargin) { (s, d) =>
      // engine matches the oracle's IS NOT NULL: a dead-lettered null
      // embedding projects to null dist, which Spark's ascending sort
      // would otherwise rank FIRST — into the top-10 the oracle never
      // emits
      val emb = t(s, d, "embeddings").where(col("embedding").isNotNull)
      val model = Pca.fit(emb, "embedding")
      val qp = model.projectVec(VectorQueries.queryVec(s, d, 0))
      Pca.project(emb, "embedding", model, "pca")
        .withColumn("dist", round(sqrt(aggregate(
          zip_with(col("pca"), typedlit(qp.toSeq), (x, y) => (x - y) * (x - y)),
          lit(0.0d), (acc, e) => acc + e)), 6))
        .select(col("vec_id"), col("dist"))
        .orderBy(col("dist"), col("vec_id"))
        .limit(10)
    }
  )
}
