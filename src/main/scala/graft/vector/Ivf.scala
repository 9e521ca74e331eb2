package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbors — the second
  * scale path next to hyperplane LSH (Similarity.annTopK). Vectors are
  * assigned to their nearest of k trained centroids ("cells"); a query
  * scores only the nProbe nearest cells' members, shrinking the scored
  * set from N to ≈ N·nProbe/k. Unlike LSH, cells adapt to the data
  * distribution, so recall holds on clustered corpora with far fewer
  * probes.
  *
  * Scale shape: training aggregates k×dim values through a distributed
  * per-(cell,dimension) average — only the centroid table (k×dim
  * doubles, driver-bounded by construction) ever leaves the executors.
  * Assignment is a per-row O(k·dim) map against broadcast centroids.
  * At 100 TB the collection is written partitioned/bucketed BY
  * `ivf_cell`, so a probe prunes to nProbe partitions' files — the
  * same pruning story as the LSH bucket column.
  */
object Ivf {

  /** Nearest-centroid id by squared L2, first-wins on ties (matches
    * the SQL `ORDER BY d2, cid` tie-break in q58's oracle). */
  private def nearestCell(v: Seq[Float], cents: Array[Array[Float]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0.0
      var i = 0
      val cent = cents(c)
      val n = math.min(v.length, cent.length)
      // double subtraction/square (not float-rounded) — matches the
      // oracle's CAST-to-DOUBLE arithmetic exactly
      while (i < n) { val t = v(i).toDouble - cent(i).toDouble; d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** The query's nProbe nearest cells (driver-side: k is small). */
  def nearestCells(query: Array[Float], cents: Array[Array[Float]],
      nProbe: Int): Seq[Int] =
    cents.indices
      .map { c =>
        var d = 0.0
        var i = 0
        while (i < query.length) {
          val t = query(i).toDouble - cents(c)(i).toDouble; d += t * t; i += 1
        }
        (c, d)
      }
      .sortBy { case (c, d) => (d, c) }
      .take(nProbe).map(_._1)

  /** Attach the IVF cell id against broadcast centroids. */
  def assignCells(df: DataFrame, vec: Column,
      cents: Array[Array[Float]], as: String = "ivf_cell"): DataFrame = {
    val f = udf((v: Seq[Float]) =>
      if (v == null) None else Some(nearestCell(v, cents)))
    df.withColumn(as, f(vec))
  }

  /** Deterministic k-means: farthest-first init (the smallest-id
    * vector, then k-1 rounds of "the point maximizing distance to the
    * chosen set", ties broken by id — spreads seeds across clusters,
    * where a naive first-k-ids init can strand every seed in one
    * cluster), then `iters` Lloyd rounds. Every step is fully
    * distributed — init rounds are a TakeOrdered(1) over a scored
    * scan; each Lloyd round is assign (map) → per-(cell, dimension)
    * average (posexplode + partial agg) — and only k×dim values ever
    * return to the driver. A cell that loses all members keeps its
    * previous centroid (standard empty-cluster fallback). */
  def trainCentroids(df: DataFrame, id: String, vec: String, k: Int,
      iters: Int = 5): Array[Array[Float]] = {
    require(k >= 1, "k must be positive")
    val firstRows = df.orderBy(col(id)).limit(1).select(col(vec)).collect()
    require(firstRows.nonEmpty, "trainCentroids: empty input DataFrame")
    val chosen = scala.collection.mutable.ArrayBuffer(
      firstRows(0).getSeq[Float](0).toArray)
    while (chosen.size < k) {
      val sofar = chosen.toArray
      val minD = udf { (v: Seq[Float]) =>
        if (v == null) -1.0
        else sofar.map { c =>
          var d = 0.0; var i = 0
          val n = math.min(v.length, c.length)
          while (i < n) { val t = v(i).toDouble - c(i).toDouble; d += t * t; i += 1 }
          d
        }.min
      }
      val far = df.select(col(id), col(vec), minD(col(vec)).as("__d"))
        .orderBy(desc("__d"), col(id)).limit(1).head()
      chosen += far.getSeq[Float](1).toArray
    }
    var cents: Array[Array[Float]] = chosen.toArray
    var it = 0
    while (it < iters) {
      val assigned = assignCells(df.select(col(vec)), col(vec), cents)
      val means = assigned
        .select(col("ivf_cell"), posexplode(col(vec)).as(Seq("__pos", "__x")))
        .groupBy(col("ivf_cell"), col("__pos"))
        .agg(avg(col("__x")).as("__m"))
        .collect()
      val next = cents.map(_.clone())
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2).toFloat
      }
      cents = next
      it += 1
    }
    cents
  }

  /** IVF top-k: score only the nProbe nearest cells' members. With
    * nProbe = k this degenerates to exact brute force (recall 1.0). */
  def ivfTopK(df: DataFrame, id: String, vec: String, query: Array[Float],
      k: Int, cents: Array[Array[Float]], nProbe: Int = 2): DataFrame = {
    val probes = nearestCells(query, cents, nProbe)
    val candidates = assignCells(df, col(vec), cents)
      .filter(col("ivf_cell").isin(probes: _*))
    Similarity.topK(candidates, id, vec, query, k)
  }
}
