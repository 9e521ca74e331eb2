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
}
