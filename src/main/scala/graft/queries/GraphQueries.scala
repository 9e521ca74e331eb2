package graft.queries

import org.apache.spark.sql.functions._
import Q.t

/** Graph-scoring queries: centrality over the semantic (kNN) document
  * graph. The DuckDB oracle unrolls the fixed-iteration PageRank loop
  * as one CTE per iteration over the same kNN edge list q79 checks.
  */
object GraphQueries {

  /** Unrolled-PageRank oracle: kNN edges (shared CTE with q79) →
    * out-degree weights → `iters` rank tables. Each iteration rounds
    * to 9 decimals — the same order-independence contract the Spark
    * loop applies (`ops/Graph.scala`), so the iterate is identical on
    * both engines regardless of summation order. */
  private def pagerankSql(iters: Int, damping: Double): String = {
    val steps = (1 to iters).map { i =>
      s"""r$i AS (SELECT n.node,
         |  round((SELECT (1 - CAST($damping AS DOUBLE)) / cnt FROM nn)
         |        + CAST($damping AS DOUBLE) * coalesce(s.inp, 0), 9) AS rank
         | FROM nodes n LEFT JOIN (
         |   SELECT e.dst AS node, SUM(p.rank * e.w) AS inp
         |   FROM ew e JOIN r${i - 1} p ON p.node = e.src GROUP BY e.dst) s
         | USING (node))""".stripMargin
    }.mkString(",\n")
    s"""WITH ${VectorQueries.knnRankedCte},
       |edges AS (SELECT ia AS src, ib AS dst FROM r WHERE rank <= 3),
       |deg AS (SELECT src, count(*) AS dg FROM edges GROUP BY src),
       |ew AS (SELECT e.src, e.dst, 1.0 / d.dg AS w FROM edges e JOIN deg d USING (src)),
       |nodes AS (SELECT DISTINCT node FROM (
       |  SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
       |nn AS (SELECT count(*) AS cnt FROM nodes),
       |r0 AS (SELECT node, round(1.0 / (SELECT cnt FROM nn), 9) AS rank FROM nodes),
       |$steps
       |SELECT node AS vec_id,
       |  floor((round(rank * 1e9) + 500) / 1000) / 1e6 AS pagerank
       |FROM r$iters ORDER BY vec_id""".stripMargin
  }

  val qs: Seq[Q] = Seq(

    // ---- PageRank over the semantic kNN graph ----
    // Centrality as a data-quality prior: documents many neighbors
    // point at rank high (prototypical content), isolated chains rank
    // at the floor. Edges are q79's cell-bounded kNN (up to k=3 edges
    // per node; a cell with <4 members yields fewer — a singleton-cell
    // vector vanishes from the graph entirely, so dangling/leaked mass
    // is possible and accepted; both engines derive the identical
    // edge list, so parity is unaffected).
    Q("q83_pagerank", pagerankSql(iters = 5, damping = 0.85)) { (s, d) =>
      val emb = t(s, d, "embeddings")
      val knn = graft.vector.SemDedup.knnGraph(emb, "vec_id", "embedding",
        VectorQueries.corpusQuantizer(emb), k = 3)
      val edges = knn.select(col("vec_id").as("src"), col("neighbor").as("dst"))
      graft.ops.Graph.pageRank(edges, iterations = 5, damping = 0.85)
        .select(col("node").as("vec_id"), col("pagerank"))
        .orderBy(col("vec_id"))
    },
  )
}
