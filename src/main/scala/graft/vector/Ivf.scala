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
        // min-dim guard: the row-side assignment truncates on a
        // dimension mismatch (embedder change); the query path must
        // not be the one place that throws instead
        val n = math.min(query.length, cents(c).length)
        while (i < n) {
          val t = query(i).toDouble - cents(c)(i).toDouble; d += t * t; i += 1
        }
        (c, d)
      }
      .sortBy { case (c, d) => (d, c) }
      .take(nProbe).map(_._1)

  /** Attach the IVF cell id against broadcast centroids.
    *
    * Scale note: this is the FLAT path — per-row O(k·dim) against all
    * k centroids. With k grown proportionally to N (SemDedup
    * .cellCountFor), total assignment work is O(N·k) = O(N²/cellSize):
    * fine through sf1, a wall at the 100 TB design point. Use
    * `assignCellsTwoLevel` (per-row O(2√k·dim)) when k is corpus-
    * scaled; keep the flat path for small fixed k (single-query IVF
    * probes, trained k-means with k ≤ a few hundred). */
  def assignCells(df: DataFrame, vec: Column,
      cents: Array[Array[Float]], as: String = "ivf_cell"): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    df.withColumn(as, ColumnBridge.column(
      NearestCell(ColumnBridge.expression(vec), cents, null, null)))
  }

  /** Coarse-cell count for a k-centroid two-level quantizer: ≈ √k,
    * min 4. Per-row assignment is then O((√k + k/√k)·dim) =
    * O(2√k·dim) — at k = 20 000 that is ~280·dim instead of
    * 20 000·dim, a 70× flop cut, and the cut widens as k grows. */
  def coarseCountFor(k: Int): Int =
    math.max(4, math.ceil(math.sqrt(k.toDouble)).toInt)

  /** Fine→coarse group map (the IMI / IVF-two-level list structure).
    * A fine centroid whose index is also a coarse index ANCHORS its
    * own group — guarantees every coarse group holds at least one
    * fine centroid, so no row can be routed to a memberless group —
    * and the rest map to their nearest coarse centroid (ties → the
    * smaller coarse id, matching the SQL `ORDER BY d2, gid`). */
  def fineToCoarse(fine: Array[Array[Float]],
      coarse: Array[Array[Float]]): Array[Int] =
    Array.tabulate(fine.length) { f =>
      if (f < coarse.length) f
      else nearestCell(scala.collection.immutable.ArraySeq.unsafeWrapArray(fine(f)), coarse)
    }

  /** Two-level (coarse→fine) cell assignment: route each row to its
    * nearest of √k coarse centroids, then score only that group's
    * fine centroids. Per-row cost O(2√k·dim) — the scale-safe
    * replacement for the flat O(k·dim) `assignCells` when k grows
    * with the corpus (SemDedup). The assignment is approximate in the
    * standard IVF-IMI sense: a row whose true nearest fine centroid
    * lives in a different coarse group gets its group-local nearest
    * instead (cells stay balanced; dedup/kNN recall dials via
    * cellSize exactly as before). Deterministic: both argmins break
    * ties toward the smaller id, so any engine reproduces the cells
    * (q87's DuckDB oracle re-derives them from the same seed rule). */
  def assignCellsTwoLevel(df: DataFrame, vec: Column,
      fine: Array[Array[Float]], coarse: Array[Array[Float]],
      as: String = "ivf_cell"): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    val groupOf = fineToCoarse(fine, coarse)
    val members: Array[Array[Int]] = {
      val buf = Array.fill(coarse.length)(Vector.newBuilder[Int])
      var f = 0
      while (f < groupOf.length) { buf(groupOf(f)) += f; f += 1 }
      buf.map(_.result().toArray) // ascending fine ids by construction
    }
    df.withColumn(as, ColumnBridge.column(
      NearestCell(ColumnBridge.expression(vec), fine, coarse, members)))
  }

  /** Fully distributed two-level assignment — the 100 TB form: only
    * the √k coarse centroids are broadcast (a few MB at any realistic
    * k); the k fine centroids stay a DataFrame `(cid, cemb)` that
    * never visits the driver. Rows are routed to their coarse group
    * map-side, then joined to that group's fine centroids (Spark
    * broadcasts the fine table while it fits, shuffle-joins on the
    * group id beyond — either way per-row candidates ≈ k/√k = √k),
    * and the per-row argmin is a window over (d2, cid). Produces
    * EXACTLY the same cells as `assignCellsTwoLevel` (same seed rule,
    * same left-fold summation order, same tie-breaks — asserted in
    * IvfSpec). Rows with a null vector keep a null cell. */
  def assignCellsTwoLevelDist(df: DataFrame, id: String, vec: String,
      fineDf: DataFrame, coarse: Array[Array[Float]],
      as: String = "ivf_cell"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.graftshim.ColumnBridge
    def coarseCell(c: Column): Column = ColumnBridge.column(
      NearestCell(ColumnBridge.expression(c), coarse, null, null))
    // anchor rule: fine centroid cid < |coarse| owns group cid
    val fineG = fineDf
      .withColumn("__gid",
        when(col("cid") < coarse.length, col("cid").cast("int"))
          .otherwise(coarseCell(col("cemb"))))
      .select(col("cid"), col("cemb"), col("__gid"))
    val withG = df.withColumn("__gid", coarseCell(col(vec)))
    val nullVec = withG.filter(col("__gid").isNull)
      .drop("__gid").withColumn(as, lit(null).cast("int"))
    // same left-fold double arithmetic as the UDF path: zip_with in
    // index order, aggregate folds left
    val d2 = expr(s"""aggregate(
        zip_with(`$vec`, `__cemb`, (a, b) ->
          (CAST(a AS DOUBLE) - CAST(b AS DOUBLE)) *
          (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))),
        0D, (acc, x) -> acc + x)""")
    val w = Window.partitionBy(col(id))
      .orderBy(col("__d2").asc, col("__cid").asc)
    val assigned = withG.filter(col("__gid").isNotNull)
      .join(fineG.select(col("cid").as("__cid"), col("cemb").as("__cemb"),
        col("__gid")), Seq("__gid"))
      .withColumn("__d2", d2)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .withColumn(as, col("__cid").cast("int"))
      .drop("__gid", "__cid", "__cemb", "__d2", "__rn")
    assigned.unionByName(nullVec)
  }

  /** Deterministic id-prefix seed centroids — the reproducible-across-
    * engines seeding the oracle queries share (`vec_id < k`). The
    * collect is driver-bounded by an explicit, documented cap: k×dim
    * floats (default cap 65 536 seeds ≈ 100 MB at dim 384). Beyond
    * the cap, keep centroids distributed — `assignCellsTwoLevelDist`
    * takes the fine table as a DataFrame and needs only the √k coarse
    * prefix collected. */
  def seedCentroids(df: DataFrame, id: String, vec: String, k: Int,
      maxCollect: Int = 65536): Array[Array[Float]] = {
    require(k <= maxCollect,
      s"seedCentroids: k=$k exceeds the driver-collect cap $maxCollect; " +
        "use assignCellsTwoLevelDist with the fine table as a DataFrame")
    df.filter(col(id) < k).orderBy(col(id)).select(col(vec))
      .collect().map(_.getSeq[Float](0).toArray)
  }

  private def minDistUdf(sofar: Array[Array[Float]]) = udf { (v: Seq[Float]) =>
    if (v == null) -1.0
    else sofar.map { c =>
      var d = 0.0; var i = 0
      val n = math.min(v.length, c.length)
      while (i < n) { val t = v(i).toDouble - c(i).toDouble; d += t * t; i += 1 }
      d
    }.min
  }

  /** Deterministic k-means with a k-means‖-style init (Bahmani et al.
    * 2012): the smallest-id vector seeds round 0, then TWO passes of
    * d²-weighted oversampling — each pass scores every row's squared
    * distance to the candidate set and keeps rows where a hash-derived
    * uniform (`xxhash64(id, pass)`, engine-reproducible, no RNG state)
    * falls below ℓ·d²/Σd² with ℓ = 4k — and a greedy farthest-first
    * pass over the ≈2ℓ collected candidates finishes on the driver
    * (O(|C|·k·dim) driver flops; |C| is ℓ-bounded, not N). Init cost
    * is a CONSTANT number of Spark jobs (seed + 2×(agg, collect)) —
    * the previous farthest-first init ran k−1 sequential
    * orderBy-limit(1) actions, O(k) full scans, a driver-latency wall
    * once k is corpus-scaled. Then `iters` Lloyd rounds: assign (map)
    * → per-(cell, dimension) average (posexplode + partial agg); only
    * k×dim values ever return to the driver. A cell that loses all
    * members keeps its previous centroid (standard empty-cluster
    * fallback). */
  def trainCentroids(df: DataFrame, id: String, vec: String, k: Int,
      iters: Int = 5): Array[Array[Float]] = {
    require(k >= 1, "k must be positive")
    // the seed must skip null vectors like the top-up pass does — the
    // module's contract elsewhere is "null vector keeps a null cell",
    // and the min-id row being a failed embed must not NPE training
    val firstRows = df.filter(col(vec).isNotNull).orderBy(col(id)).limit(1)
      .select(col(id).cast("long"), col(vec)).collect()
    require(firstRows.nonEmpty,
      "trainCentroids: empty input DataFrame (or all vectors null)")
    val seed0 = (firstRows(0).getLong(0), firstRows(0).getSeq[Float](1).toArray)
    val cand = scala.collection.mutable.LinkedHashMap(seed0)
    val ell = 4L * k
    var pass = 1
    while (pass <= 2) {
      val minD = minDistUdf(cand.valuesIterator.toArray)
      val scored = df
        .select(col(id).cast("long").as("__id"), col(vec).as("__v"))
        .withColumn("__d", minD(col("__v")))
        .filter(col("__d") > 0) // null vectors (-1) and exact members (0)
      val sumRow = scored.agg(sum(col("__d"))).head()
      val sumD = if (sumRow.isNullAt(0)) 0.0 else sumRow.getDouble(0)
      if (sumD > 0) {
        val u = pmod(xxhash64(col("__id"), lit(pass)), lit(1000000L)) / 1000000.0
        val picked = scored
          .filter(u < least(lit(1.0), lit(ell.toDouble) * col("__d") / lit(sumD)))
          .select(col("__id"), col("__v")).collect()
        picked.sortBy(_.getLong(0)).foreach { r =>
          cand.getOrElseUpdate(r.getLong(0), r.getSeq[Float](1).toArray)
        }
      }
      pass += 1
    }
    if (cand.size < k) {
      // degenerate corpus (fewer sampled candidates than k): top up
      // with the smallest ids not yet held — one bounded collect
      df.select(col(id).cast("long").as("__id"), col(vec).as("__v"))
        .filter(col("__v").isNotNull)
        .orderBy(col("__id")).limit(k + cand.size).collect()
        .foreach(r => cand.getOrElseUpdate(r.getLong(0), r.getSeq[Float](1).toArray))
    }
    // greedy farthest-first over the candidate pool, seeded at seed0:
    // deterministic (ties → smaller id), spreads the k picks across
    // clusters the same way the old per-point farthest-first did
    // ascending id (seed0 IS the smallest id, so it stays first);
    // equal-distance ties then resolve to the smaller id
    val pool = cand.toArray.sortBy(_._1)
    val chosen = scala.collection.mutable.ArrayBuffer(seed0._2)
    val inSet = scala.collection.mutable.Set(seed0._1)
    val best = scala.collection.mutable.HashMap[Long, Double]() // min d² to chosen
    while (chosen.size < k && inSet.size < pool.length) {
      val last = chosen.last
      var pickId = -1L
      var pickD = -1.0
      var pickV: Array[Float] = null
      pool.foreach { case (pid, pv) =>
        if (!inSet.contains(pid)) {
          var d = 0.0; var i = 0
          val n = math.min(pv.length, last.length)
          while (i < n) { val t = pv(i).toDouble - last(i).toDouble; d += t * t; i += 1 }
          val m = math.min(best.getOrElse(pid, Double.MaxValue), d)
          best(pid) = m
          if (m > pickD) { pickD = m; pickId = pid; pickV = pv }
        }
      }
      if (pickId < 0) inSet ++= pool.map(_._1) // exhausted
      else { chosen += pickV; inSet += pickId; best.remove(pickId) }
    }
    var cents: Array[Array[Float]] =
      if (chosen.size >= k) chosen.take(k).toArray
      else Array.tabulate(k)(i => chosen(i % chosen.size).clone())
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
