package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph scoring over an edge list — PageRank as the
  * canonical instance. In a training-data pipeline this runs over a
  * document similarity graph (e.g. the kNN graph from
  * `vector.SemDedup.knnGraph`) or a crawl link graph to produce a
  * centrality/quality prior per document (the crawl-frontier
  * prioritization signal; reference analog: the crawler's relevance
  * gate, newscrawler.py:48-57, generalized to a graph-global score).
  *
  * Scale shape (same iterative-join discipline as
  * `NearDup.connectedComponents`):
  *  - the weighted edge list is computed ONCE (one out-degree agg +
  *    one join), `localCheckpoint`ed, and re-read by every iteration —
  *    the expensive upstream (e.g. the kNN build) never re-executes;
  *  - each iteration is one shuffle-join (rank × edge weight) plus one
  *    hash agg on the destination — no driver-side state beyond the
  *    one node-count long;
  *  - each iteration's rank table is `localCheckpoint`ed to truncate
  *    lineage and the PREVIOUS iteration's blocks are explicitly
  *    unpersisted (see `NearDup.freeLocalCheckpoint`);
  *  - ranks are rounded to `roundTo` decimals each iteration: floating
  *    sums are order-dependent, so an unrounded loop would drift
  *    across engines/partitionings — rounding at 1e-9 against ~1e-16
  *    relative error makes every iteration reproducible except at
  *    astronomically rare rounding ties (a value within ~1e-16 of a
  *    0.5e-9 boundary can round differently under Spark's
  *    BigDecimal-on-shortest-decimal rule vs an engine's plain double
  *    rounding, and a single early mismatch would then propagate).
  */
object Graph {

  /** PageRank over `edges` for a fixed number of iterations.
    * Returns `(node, pagerank)` with pagerank rounded to 6 decimals.
    *
    * Semantics: rank'(v) = (1-damping)/N + damping * Σ_{u→v} rank(u)/outdeg(u).
    * Nodes with no incoming edges settle at (1-damping)/N. Dangling
    * nodes (no OUT-edges) contribute nothing — their mass leaks, the
    * accepted simplification here. A kNN edge list keeps this small
    * but not zero: a cell with fewer than k+1 members emits fewer
    * than k edges, and a singleton-cell vector is absent entirely. */
  def pageRank(edges: DataFrame, src: String = "src", dst: String = "dst",
      iterations: Int = 5, damping: Double = 0.85,
      roundTo: Int = 9, maxBroadcastNodes: Long = 250000L): DataFrame = {
    require(iterations >= 1, "pageRank: iterations must be >= 1")
    require(damping > 0.0 && damping < 1.0, "pageRank: damping must be in (0,1)")
    val spark = edges.sparkSession
    // edge count rides the checkpoint's materialization job (same
    // accumulator treatment as connectedComponents); retries can
    // over-count, harmless — it only sizes loop partitions
    val edgeAcc = spark.sparkContext.longAccumulator("pr_edges")
    val eRaw = edges.select(col(src).as("src"), col(dst).as("dst"))
    val e = eRaw.mapPartitions { rows =>
      rows.map { r => edgeAcc.add(1L); r }
    }(org.apache.spark.sql.Encoders.row(eRaw.schema)).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    // one driver-side long — the only scalar the loop needs
    val n = nodes.count()
    if (n == 0) {
      // empty edge list: return the empty (node, pagerank) frame rather
      // than silently folding 1/0 = Infinity into the rank literals.
      // The frame must NOT lean on the checkpoints being freed below —
      // a zero-row frame from the session, not a select over `nodes`,
      // or the caller's first action would hit an unpersisted
      // checkpoint block.
      val out = edges.sparkSession.createDataFrame(
        edges.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node",
            nodes.schema("node").dataType),
          org.apache.spark.sql.types.StructField("pagerank",
            org.apache.spark.sql.types.DoubleType))))
      NearDup.freeLocalCheckpoint(e)
      NearDup.freeLocalCheckpoint(nodes)
      return out
    }
    // Loop discipline mirrors connectedComponents (see its scaladoc;
    // r12 job audit: the old loop scheduled 56 one-task jobs for 5
    // iterations at sf0.1 — AQE stage-jobs plus a broadcast-exchange
    // job per round, each with its own driver latency, vs 18 jobs for
    // the whole CC query):
    //  - AQE paused and stats-based broadcasts disabled inside the
    //    loop — partitions are pre-sized, and every broadcast exchange
    //    is its own scheduled job per iteration;
    //  - loop shuffles sized to the materialized edge count (~2M edges
    //    per partition, session default as the ceiling), not the
    //    session default — a small graph must not pay 32-partition
    //    exchanges × iterations;
    //  - the stationary sides are checkpointed pre-partitioned AND
    //    pre-sorted on their join keys (`weighted` on src, `nodes` on
    //    node): LogicalRDD carries physical partitioning/ordering
    //    across a localCheckpoint, so each iteration shuffles only the
    //    moving rank/contribution rows.
    // Results are bit-identical: ranks round to 1e-9 every iteration
    // precisely so partitioning-dependent float sum order cannot leak
    // into the output (see scaladoc).
    val edgeCount = edgeAcc.value.longValue
    val defaultParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val loopParts = math.max(1L, math.min(defaultParts.toLong,
      edgeCount / 2000000L + 1L)).toInt
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevAutoBcast =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    var weighted: DataFrame = null
    var nodesByKey: DataFrame = null
    var ranks: DataFrame = null
    var ok = false
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", loopParts)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
      weighted = e.join(outDeg, "src")
        .select(col("src"), col("dst"), (lit(1.0) / col("__deg")).as("__w"))
        .repartition(loopParts, col("src"))
        .sortWithinPartitions(col("src"))
        .localCheckpoint()
      NearDup.freeLocalCheckpoint(e)
      nodesByKey = nodes
        .repartition(loopParts, col("node"))
        .sortWithinPartitions(col("node"))
        .localCheckpoint()
      NearDup.freeLocalCheckpoint(nodes)

      val base = lit((1.0 - damping) / n)
      ranks = nodesByKey
        .select(col("node"), round(lit(1.0 / n), roundTo).as("rank"))
        .localCheckpoint()
      // Same two round shapes as connectedComponents (r15): when the
      // rank table fits maxBroadcastNodes rows, broadcast it into the
      // stationary weighted-edge join and broadcast the contribution
      // table back over the node scan — the rank table stops
      // traveling through exchanges (only the small per-round
      // contribution agg shuffles). Results are bit-identical either
      // way: the per-iteration 1e-9 rounding already makes the sum
      // order immaterial (the cross-engine contract), and the
      // property pin vs naive power iteration drives both shapes.
      // Big graphs keep the keyed-exchange shape.
      val bcastRounds = n <= maxBroadcastNodes
      for (_ <- 1 to iterations) {
        val rankSrc = ranks.withColumnRenamed("node", "src")
        val contrib = weighted
          .join(if (bcastRounds) broadcast(rankSrc) else rankSrc, "src")
          .groupBy(col("dst").as("node"))
          .agg(sum(col("rank") * col("__w")).as("__in"))
        val next = nodesByKey
          .join(if (bcastRounds) broadcast(contrib) else contrib,
            Seq("node"), "left")
          .select(col("node"),
            round(base + lit(damping) * coalesce(col("__in"), lit(0.0)),
              roundTo).as("rank"))
          .localCheckpoint()
        NearDup.freeLocalCheckpoint(ranks)
        ranks = next
      }
      ok = true
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.shuffle.partitions", defaultParts)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAutoBcast)
      // success frees the stationary tables only (the final rank pin
      // backs the returned frame — its consumer releases it); failure
      // must free everything still pinned. freeLocalCheckpoint is
      // unpersist-based, so double-freeing is a harmless no-op.
      if (ok) Seq(weighted, nodesByKey).filter(_ != null)
        .foreach(NearDup.freeLocalCheckpoint)
      else Seq(e, nodes, weighted, nodesByKey, ranks).filter(_ != null)
        .foreach(NearDup.freeLocalCheckpoint)
    }
    // Final 6dp projection via EXACT INTEGER arithmetic (r18): the
    // ranks sit on the per-iteration 1e-9 grid, so ~1/1000 of them
    // land exactly ON a 6dp midpoint — where Spark's BigDecimal-on-
    // exact-binary HALF_UP and a C-style multiply-then-nearbyint
    // round() can legitimately disagree about the SAME double (the
    // headroom audit read dist=0 for this column; emitting the raw
    // 9dp grid instead surfaced a different 1-row cross-engine
    // straddle at sf0.001). Extracting the grid integer N =
    // rint(rank·1e9) — exact, the value is within ulps of N — and
    // half-up-rounding in integer space, floor((N+500)/1000)/1e6,
    // is the same function of the same double on every engine:
    // midpoint landings are decided by +500/floor, not by whose
    // round() implementation runs. The 9dp iteration contract still
    // absorbs sum-order noise; the residual (a pre-round sum
    // straddling a 1e-9 boundary) is then absorbed AGAIN by the
    // 1000-step projection unless it sits on the 6dp grid edge —
    // the compound rarity that has kept this row green, now without
    // the round()-implementation channel on top of it.
    Pinned.track(ranks.select(col("node"),
      (floor((rint(col("rank") * lit(1e9)) + lit(500.0)) / lit(1000.0))
        / lit(1e6)).as("pagerank")))
  }

  /** Duplicate-cluster size distribution over a component labeling
    * (`connectedComponents` / the label store): how many clusters of
    * each size, and how many documents they hold — the one chart that
    * says whether duplication is a long tail of pairs (cheap to keep)
    * or a few mega-clusters (one template page crawled a million
    * times; worth a source-level fix instead of row dedup). Two
    * integer-exact aggregations, nothing else.
    *
    * Note the distribution covers LABELED nodes only — singletons
    * never enter the pair graph, so "cluster_size = 1" rows here mean
    * label-store artifacts (e.g. pruned components), not unique docs. */
  def componentSizeDistribution(labels: DataFrame,
      comp: String = "component"): DataFrame =
    labels.groupBy(col(comp)).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("cluster_size")).as("n_docs"))
}
