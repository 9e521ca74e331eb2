package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Fusion

/** Rank-fusion + MMR semantics: the properties the q105/q111 queries
  * rest on, pinned on planted data.
  */
class FusionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("RRF: rank math, missing-pool rows, and determinism under ties") {
    val a = Seq((1L, 0.9), (2L, 0.8), (3L, 0.7)).toDF("id", "score")
    val b = Seq((2L, 0.99), (4L, 0.5)).toDF("id", "score")
    val out = Fusion.reciprocalRankFusion(Seq(a, b), "id", k = 60, topK = 10)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getInt(2)))).toMap
    // id 2: rank 2 in a, rank 1 in b → 1/62 + 1/61
    assert(math.abs(out(2L)._1 - (1.0 / 62 + 1.0 / 61)) < 1e-6)
    assert(out(2L)._2 == 2)
    // id 1: rank 1 in a only → 1/61, one ranker
    assert(math.abs(out(1L)._1 - 1.0 / 61) < 1e-6 && out(1L)._2 == 1)
    // id 4 appears only in b at rank 2 → 1/62
    assert(math.abs(out(4L)._1 - 1.0 / 62) < 1e-6 && out(4L)._2 == 1)
    // a two-way tie on score ranks by id — deterministic across runs
    val tied = Seq((7L, 0.5), (5L, 0.5)).toDF("id", "score")
    val r = Fusion.reciprocalRankFusion(Seq(tied), "id", topK = 2).collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(5L, 7L),
      "tie must resolve to the smaller id first")
  }

  test("RRF: the fused head can differ from either ranker's head") {
    // doc 10 is 2nd in both pools; doc 11/12 are 1st in one pool but
    // absent from the other — consensus beats single-pool wins
    val a = Seq((11L, 0.9), (10L, 0.8)).toDF("id", "score")
    val b = Seq((12L, 0.9), (10L, 0.8)).toDF("id", "score")
    val top = Fusion.reciprocalRankFusion(Seq(a, b), "id", topK = 1)
      .head().getLong(0)
    assert(top == 10L, "the doc both rankers agree on must fuse to the top")
  }

  test("RRF: a corpus-sized ranking fails loudly at the pool cap") {
    // the pools-not-corpora contract is enforced at execution: a
    // ranking larger than maxPool hits the codegen'd raise_error
    // instead of silently single-task-sorting the whole input
    val corpus = spark.range(0, 100)
      .select(col("id"), (lit(1.0) / (col("id") + 1)).as("score"))
    val e = intercept[Exception] {
      Fusion.reciprocalRankFusion(Seq(corpus), "id",
        topK = 5, maxPool = 20).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(e).exists(c =>
        Option(c.getMessage).exists(_.contains("maxPool"))),
      s"expected the maxPool raise_error, got: $e")
    // at or under the cap the same ranking shape fuses normally —
    // built explicitly (limit() on an unsorted frame picks
    // nondeterministic rows; range(0,20) pins ids 0-19)
    val pool = spark.range(0, 20)
      .select(col("id"), (lit(1.0) / (col("id") + 1)).as("score"))
    val ok = Fusion.reciprocalRankFusion(Seq(pool), "id",
      topK = 5, maxPool = 20).collect()
    assert(ok.length == 5 && ok.head.getLong(0) == 0L)
  }

  test("MMR: near-duplicate suppression and the lambda extremes") {
    // candidates: 1 and 2 are near-identical vectors with the top two
    // relevance scores; 3 is orthogonal with lower relevance
    val pool = Seq(
      (1L, 0.99, Seq(1.0f, 0.0f, 0.0f)),
      (2L, 0.98, Seq(0.999f, 0.001f, 0.0f)),
      (3L, 0.50, Seq(0.0f, 1.0f, 0.0f)),
      (4L, 0.40, Seq(0.0f, 0.0f, 1.0f)))
      .toDF("id", "score", "vec")
    // balanced lambda: the near-dup of the first pick must NOT be
    // second — the orthogonal doc 3 outranks it
    val picked = Fusion.mmrRerank(pool, "id", "vec", lambda = 0.5, k = 3)
      .orderBy(col("mmr_rank")).collect().map(_.getLong(0)).toSeq
    assert(picked.head == 1L, "first pick is pure relevance")
    assert(picked(1) == 3L,
      s"diversity must demote the near-dup (got $picked)")
    // lambda=1: pure relevance order, duplicates and all
    val rel = Fusion.mmrRerank(pool, "id", "vec", lambda = 1.0, k = 4)
      .orderBy(col("mmr_rank")).collect().map(_.getLong(0)).toSeq
    assert(rel == Seq(1L, 2L, 3L, 4L))
  }

  test("MMR objectiveGrid: snapped argmax equals the raw greedy on the real fixture pool; grid ties break to smaller id") {
    // q111 ships with objectiveGrid = Some(6); on the real pool the
    // grid must be semantics-preserving (objective gaps >> half-grid)
    // — a divergence here means a midpoint moved into range and the
    // q111 oracle needs re-adjudication
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qv = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val pool = graft.vector.Similarity.topK(emb, "vec_id", "embedding", qv, 30)
      .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
    def run(grid: Option[Int]) =
      Fusion.mmrRerank(pool, "vec_id", "embedding", lambda = 0.7, k = 10,
          objectiveGrid = grid)
        .orderBy(col("mmr_rank")).collect().map(_.getLong(0)).toSeq
    assert(run(Some(6)) == run(None))
    // objectives EXACTLY tied on the grid: id breaks the tie — two
    // identical vectors with identical scores pick the smaller id
    val tied = Seq(
      (7L, 0.5, Seq(1.0f, 0.0f)), (3L, 0.5, Seq(1.0f, 0.0f)),
      (9L, 0.1, Seq(0.0f, 1.0f))).toDF("id", "score", "vec")
    val got = Fusion.mmrRerank(tied, "id", "vec", lambda = 0.7, k = 2,
        objectiveGrid = Some(6))
      .orderBy(col("mmr_rank")).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L, 9L), s"grid tie must break to smaller id: $got")
  }

  test("MMR prune-quality report: forced cut on a near-dup-heavy pool") {
    // The audit op behind q139: 6 planted clusters × 20 near-identical
    // members (scores descending within a cluster) — the pool MMR's
    // prune is built for. nPlanes=2 → 5 cells, maxPool=15 → perCell=3:
    // a forced, heavy cut (page ≤ 15 of 120).
    val dirs = Seq(
      Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f), Seq(0f, 0f, 1f, 0f),
      Seq(0f, 0f, 0f, 1f), Seq(0.7f, 0.7f, 0f, 0f), Seq(0f, 0f, 0.7f, 0.7f))
    val rows = for {
      (dir, c) <- dirs.zipWithIndex
      m <- 0 until 20
    } yield ((c * 100 + m).toLong,
      0.9 - 0.1 * c - 0.001 * m,
      dir.map(_ + 0.001f * m))
    // one unrankable row: must not count toward pool_n (the report
    // audits the pool mmrRerankLarge itself would rank)
    val pool = rows.toDF("id", "score", "vec").unionByName(
      Seq((9999L, Double.NaN, Seq(1f, 0f, 0f, 0f))).toDF("id", "score", "vec"))
    def report(nPlanes: Int, maxPool: Int) =
      Fusion.mmrPruneQualityReport(pool, "id", "vec",
          lambdas = Seq(0.5, 1.0), k = 3, maxPool = maxPool, nPlanes = nPlanes)
        .collect().map(r =>
          (r.getDouble(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // a well-provisioned prune (17 cells for 6 clusters) and a starved
    // one (5 cells — clusters must collide, and a colliding cell's
    // score cut drops the weaker cluster entirely)
    val fine = report(nPlanes = 4, maxPool = 105)
    val starved = report(nPlanes = 2, maxPool = 15)
    for (rep <- Seq(fine, starved)) {
      assert(rep.map(_._1).toSeq == Seq(0.5, 1.0))
      rep.foreach { case (_, k, poolN, pageN, _) =>
        assert(k == 3)
        assert(poolN == 120L, s"unrankable row must not count: $poolN")
        assert(pageN < poolN, s"the cut must actually fire: page $pageN")
      }
      // the page is built once — lambda must not change its size
      assert(rep.map(_._4).distinct.length == 1)
      // lambda=1: the containment guarantee makes overlap EXACTLY 1.0
      // under ANY provisioning — the q139 oracle row
      assert(rep.find(_._1 == 1.0).get._5 == 1.0)
    }
    // lambda<1 is what the audit exists to measure: near-dups cluster
    // into cells, so with enough cells each cluster's representatives
    // survive the cut and the greedy agrees with the exact one; a
    // starved cell grid reads LOW — the report flags the bad config
    // instead of hiding it (values deterministic: sha-derived planes,
    // fixed seed; observed 1.0 vs 1/3)
    val fineOv = fine.find(_._1 == 0.5).get._5
    val starvedOv = starved.find(_._1 == 0.5).get._5
    assert(fineOv >= 0.9, s"well-provisioned overlap at lambda=0.5: $fineOv")
    assert(starvedOv <= 0.5, s"starved overlap should read low: $starvedOv")
    assert(starvedOv < fineOv)
    // the audit refuses pools it cannot exactly-greedy on the driver
    val e = intercept[IllegalArgumentException] {
      Fusion.mmrPruneQualityReport(pool, "id", "vec", maxEval = 50)
    }
    assert(e.getMessage.contains("maxEval"))
  }

  test("MMR: deterministic, k-bounded, and pool-capped") {
    val pool = Seq(
      (5L, 0.5, Seq(1.0f, 0.0f)), (6L, 0.5, Seq(0.0f, 1.0f)))
      .toDF("id", "score", "vec")
    // equal relevance, no picks yet → tie breaks to smaller id
    val first = Fusion.mmrRerank(pool, "id", "vec", k = 1)
      .head().getLong(0)
    assert(first == 5L)
    // k beyond pool size returns the whole pool, ranked
    assert(Fusion.mmrRerank(pool, "id", "vec", k = 10).count() == 2)
    // the pool cap is a loud contract, not a silent truncation
    val big = spark.range(0, 50)
      .select(col("id"), lit(0.5).as("score"),
        array(lit(1.0f), lit(0.0f)).as("vec"))
    val e = intercept[IllegalArgumentException] {
      Fusion.mmrRerank(big, "id", "vec", k = 3, maxPool = 10)
    }
    assert(e.getMessage.contains("maxPool"))
  }

  test("mmrRerankLarge overflow probe is vector-free at the driver; passthrough equals the exact greedy") {
    // r17 ADVICE close: the old probe collected maxPool+1 FULL rows,
    // so an overflowing pool shipped every vector to the driver only
    // to discard them (~330 MB at dim 4096). The probe now
    // materializes executor-side (limit + eager localCheckpoint) and
    // only a passthrough pool's vectors ever reach the driver. The
    // row-width audit: sum task-result bytes of exactly this call's
    // jobs (job-group filtered) and cap them well under the pool's
    // vector payload.
    val dim = 2048
    val nRows = 400
    val pool = spark.range(0, nRows).select(
      col("id"),
      round(lit(1.0) - col("id") * 0.001, 6).as("score"),
      org.apache.spark.sql.functions.transform(
        sequence(lit(0), lit(dim - 1)),
        i => sin(col("id") * 7 + i).cast("float")).as("vec"))
    val sc = spark.sparkContext
    val group = s"mmr-probe-width-${System.nanoTime()}"
    val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val bytes = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (Option(js.properties).exists(p =>
            group == p.getProperty("spark.jobGroup.id")))
          js.stageIds.foreach(sid => stages.add(sid))
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (stages.contains(te.stageId) && te.taskMetrics != null)
          bytes.addAndGet(te.taskMetrics.resultSize)
    }
    sc.addSparkListener(listener)
    val out =
      try {
        sc.setJobGroup(group, "mmr probe width audit")
        Fusion.mmrRerankLarge(pool, "id", "vec", lambda = 1.0, k = 10,
          maxPool = 66, nPlanes = 1).collect()
      } finally { sc.clearJobGroup(); sc.removeSparkListener(listener) }
    // listener delivery is async: wait for the byte count to settle
    var last = -1L
    var settled = 0
    while (settled < 3) {
      Thread.sleep(200)
      val b = bytes.get
      if (b == last) settled += 1 else { settled = 0; last = b }
    }
    // lambda=1 containment guarantee: pruned == global top-k by score
    assert(out.map(_.getLong(0)).toSeq == (0L until 10L).toSeq)
    val poolVecBytes = nRows.toLong * dim * 4
    assert(bytes.get > 0, "the job-group filter matched no tasks")
    assert(bytes.get < poolVecBytes / 2,
      s"driver received ${bytes.get} result bytes — the overflow probe is " +
        s"shipping vectors (pool payload $poolVecBytes)")
    // passthrough (pool <= maxPool) still equals the exact greedy
    val small = pool.limit(40)
    val viaLarge = Fusion.mmrRerankLarge(small, "id", "vec", lambda = 0.5,
      k = 8, maxPool = 66, nPlanes = 1).collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaExact = Fusion.mmrRerank(small, "id", "vec", lambda = 0.5, k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaLarge.toSeq == viaExact.toSeq)
  }
}
