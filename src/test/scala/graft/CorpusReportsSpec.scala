package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{CorpusDiff, CorpusReports, NearDup}

/** Closed-form pins for the corpus-governance reports (q106–q110):
  * hand-computable inputs, exact expectations.
  */
class CorpusReportsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("CorpusDiff: the four statuses land on the right ids and groups") {
    val old = Seq((1L, "a", "s1"), (2L, "b", "s1"), (3L, "c", "s2"))
      .toDF("id", "text", "src")
    val neu = Seq((2L, "b", "s1"), (3L, "CHANGED", "s2"), (4L, "d", "s3"))
      .toDF("id", "text", "src")
    val d = CorpusDiff.diff(old, neu, "id", col("text"), col("src"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(d(1L) == (("removed", "s1")))
    assert(d(2L) == (("unchanged", "s1")))
    assert(d(3L) == (("changed", "s2")), "old side's group wins for changed")
    assert(d(4L) == (("added", "s3")))
    val s = CorpusDiff.diffSummary(old, neu, "id", col("text"), col("src"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(s("s1") == ((0L, 1L, 0L, 1L)), "dense zeros, not missing rows")
    assert(s("s2") == ((0L, 0L, 1L, 0L)))
    assert(s("s3") == ((1L, 0L, 0L, 0L)))
  }

  test("diversityReport: closed-form TTRs, single-token docs have no bigrams") {
    // s1: "a b a b" + "a" → 5 tokens, 2 distinct; bigrams: ab,ba,ab →
    // 3 total 2 distinct. s2: one single-token doc → no bigram row.
    val docs = Seq(("a b a b", "s1"), ("a", "s1"), ("x", "s2"))
      .toDF("text", "source")
    val r = CorpusReports.diversityReport(docs, col("source"), col("text"))
      .collect().map(x => x.getString(0) -> x).toMap
    val s1 = r("s1")
    assert(s1.getLong(1) == 5L && s1.getLong(2) == 2L)
    assert(math.abs(s1.getDouble(3) - 0.4) < 1e-9)
    assert(s1.getLong(4) == 3L && s1.getLong(5) == 2L)
    assert(math.abs(s1.getDouble(6) - 2.0 / 3) < 1e-6)
    val s2 = r("s2")
    assert(s2.getLong(4) == 0L && math.abs(s2.getDouble(6)) < 1e-9,
      "a source with no 2-token doc reports zero bigrams, not null")
  }

  test("zipfReport: a perfect power law recovers its exponent") {
    // frequencies c(rank) = 1000/rank for ranks 1..10 → slope −1
    // exactly (log-log linear); words aa..jj keep rank ties away
    val words = ('a' to 'j').zipWithIndex.flatMap { case (ch, i) =>
      Seq.fill(1000 / (i + 1))(s"$ch$ch")
    }
    val docs = Seq((words.mkString(" "), "s")).toDF("text", "source")
    val r = CorpusReports.zipfReport(docs, col("source"), col("text"),
      topRanks = 10).head()
    assert(r.getLong(1) == 10L)
    assert(math.abs(r.getDouble(2) - (-1.0)) < 0.01,
      s"slope ${r.getDouble(2)} should be ≈ −1 for c ∝ 1/rank")
    assert(math.abs(r.getDouble(3) - math.log(1000.0)) < 0.03,
      "intercept ≈ ln(1000)")
  }

  test("zipfReport: a one-word vocabulary yields explicit null, not NaN") {
    // s_one has a single ranked token → var_pop(ln rank) = 0; the fit
    // is undefined and must surface as null, while s_two still fits
    val docs = Seq(("solo solo solo", "s_one"), ("a a a b", "s_two"))
      .toDF("text", "source")
    val r = CorpusReports.zipfReport(docs, col("source"), col("text"),
      topRanks = 10).collect().map(x => x.getString(0) -> x).toMap
    val one = r("s_one")
    assert(one.getLong(1) == 1L)
    assert(one.isNullAt(2) && one.isNullAt(3),
      "single-point fit must be null slope/intercept, not NaN")
    val two = r("s_two")
    assert(two.getLong(1) == 2L && !two.isNullAt(2),
      "a 2-point source still gets a real fit")
  }

  test("tokenLengthHistogram: exact power-of-two bucket boundaries") {
    val docs = Seq(
      ("", "s"),                      // 0 tokens → bucket 0
      ("t", "s"),                     // 1 → bucket 1
      ("a b c", "s"),                 // 3 → bucket 2
      ("a b c d", "s"),               // 4 → bucket 3 (boundary: bin(4)=100)
      (Seq.fill(8)("w").mkString(" "), "s")) // 8 → bucket 4
      .toDF("text", "source")
    val h = CorpusReports.tokenLengthHistogram(docs, col("source"), col("text"))
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(h == Map(0 -> 1L, 1 -> 1L, 2 -> 1L, 3 -> 1L, 4 -> 1L),
      s"got $h — the 2^k boundary must land in bucket k+1 (bit length)")
  }

  test("prefixContainmentPairs: truncations found, equal normalized, non-prefix missed") {
    val docs = Seq(
      (1L, "a b c d e f g h i j k l"),            // full doc
      (2L, "a b c d e f g h"),                    // its 8-token truncation
      (3L, "a b c d e f g h i j k l"),            // exact duplicate of 1
      (4L, "z b c d e f g h i j"),                // different head — no anchor hit
      (5L, "b c d e f g h i j k l"))              // suffix of 1: NOT prefix-anchored
      .toDF("id", "text")
    val pairs = NearDup.prefixContainmentPairs(docs, "id", col("text"), 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(pairs.contains((2L, 1L, "contained")), s"truncation missed: $pairs")
    assert(pairs.contains((2L, 3L, "contained")))
    assert(pairs.contains((1L, 3L, "equal")), "equal pair normalized to smaller id left")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L),
      "suffix containment is out of contract (prefix anchor) — documented miss")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("prefixContainmentPairs: hot template anchors are gated, cool pairs survive") {
    // 5 docs share a boilerplate 8-token head (freq > maxAnchorFreq=4)
    // → that anchor group is dropped entirely; the cool truncation
    // pair on a different head is still found
    val hot = (10L to 14L).map(i => (i, "the same boilerplate header every scrape emits verbatim"))
    val cool = Seq(
      (1L, "u v w x y z p q r s"),
      (2L, "u v w x y z p q"))
    val docs = (hot ++ cool).toDF("id", "text")
    val pairs = NearDup.prefixContainmentPairs(docs, "id", col("text"),
        anchorTokens = 8, maxAnchorFreq = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(pairs == Set((2L, 1L, "contained")),
      s"hot-anchor group must be dropped, cool pair kept: $pairs")
    // with the gate lifted the hot group's pairs come back
    val ungated = NearDup.prefixContainmentPairs(docs, "id", col("text"),
        anchorTokens = 8, maxAnchorFreq = 1000)
      .collect()
    assert(ungated.length > 1, "sanity: gate (not the data) hid the hot pairs")
  }

  test("sourceVocabOverlap: dense pairs, exact jaccard, topV cut honored") {
    val docs = Seq(
      ("a b c", "s1"), ("a b d", "s2"), ("x y z", "s3"))
      .toDF("text", "source")
    val r = CorpusReports.sourceVocabOverlap(docs, col("source"), col("text"),
        topV = 10)
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getDouble(3)))).toMap
    // s1={a,b,c}, s2={a,b,d}: |∩|=2, |∪|=4 → 0.5
    assert(r(("s1", "s2")) == ((2L, 0.5)))
    // zero-overlap pairs are PRESENT with 0, not missing
    assert(r(("s1", "s3")) == ((0L, 0.0)))
    assert(r(("s2", "s3")) == ((0L, 0.0)))
    // topV=1 keeps only each source's top word (count desc, word asc:
    // all counts 1 → alphabetical first: s1→a, s2→a, s3→x)
    val cut = CorpusReports.sourceVocabOverlap(docs, col("source"), col("text"),
        topV = 1)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    assert(cut(("s1", "s2")) == 1L && cut(("s1", "s3")) == 0L)
  }

  test("topPhrases: counts, ordering, short-doc handling") {
    val docs = Seq("x y z x y z x y", "x y z", "a b").toDF("text")
    val r = CorpusReports.topPhrases(docs, col("text"), n = 3, k = 10)
      .collect().map(x => x.getString(0) -> x.getLong(1))
    // doc1 trigrams: xyz,yzx,zxy,xyz,yzx,zxy → plus doc2's xyz → xyz×3
    assert(r.head == ("x y z" -> 3L), s"got ${r.toSeq}")
    assert(r.toMap == Map("x y z" -> 3L, "y z x" -> 2L, "z x y" -> 2L),
      "2-token docs contribute no trigram; ties rank alphabetically")
    assert(r.map(_._1).toSeq == Seq("x y z", "y z x", "z x y"))
  }

  test("cellOccupancyReport: exact occupancy stats and the hot-cell boundary") {
    // cells: 0→6 rows, 1→2, 2→1, 3→1 ⇒ mean 2.5, hot (>5.0) = cell 0
    val cells = (Seq.fill(6)(0) ++ Seq.fill(2)(1) ++ Seq(2, 3)).zipWithIndex
      .map { case (c, i) => (i.toLong, c) }.toDF("id", "cell")
    val r = CorpusReports.cellOccupancyReport(cells, "cell").head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 1L && r.getLong(2) == 6L)
    assert(math.abs(r.getDouble(3) - 2.5) < 1e-9)
    assert(r.getLong(4) == 1L, "only the 6-row cell exceeds 2× mean (5.0)")
    // exact-boundary cell (c == 2×mean) is NOT hot: 4 cells of 2,2,2,6
    // → mean 3.0; the 6-cell sits exactly at 2×mean
    val b = (Seq.fill(2)(0) ++ Seq.fill(2)(1) ++ Seq.fill(2)(2) ++
      Seq.fill(6)(3)).zipWithIndex.map { case (c, i) => (i.toLong, c) }
      .toDF("id", "cell")
    assert(CorpusReports.cellOccupancyReport(b, "cell").head().getLong(4) == 0L,
      "c == 2×mean must not count as hot (strict inequality)")
  }

  test("lshTuningCurve: probability law, monotonicity, and the b=1/r=1 edges") {
    val rows = NearDup.lshTuningCurve(spark, numHashes = 16).collect()
    assert(rows.length == 5 * 19, "5 factorizations × 19 grid points")
    rows.foreach { r =>
      val (b, rr, j, p) =
        (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3))
      val expect = 1.0 - math.pow(1.0 - math.pow(j, rr), b)
      assert(math.abs(p - expect) < 1e-6, s"b=$b r=$rr j=$j")
      assert(b * rr == 16)
    }
    // p is monotone in J for every factorization
    rows.groupBy(r => r.getInt(0)).foreach { case (_, g) =>
      val ps = g.sortBy(_.getDouble(2)).map(_.getDouble(3)).toSeq
      assert(ps == ps.sorted, "p(J) must be non-decreasing")
    }
    // b=16,r=1: p = 1-(1-J)^16 — high recall even at low J
    val easy = rows.find(r => r.getInt(0) == 16 &&
      math.abs(r.getDouble(2) - 0.2) < 1e-9).get.getDouble(3)
    assert(easy > 0.9, "16 bands of 1 row catch J=0.2 pairs")
    // b=1,r=16: p = J^16 — near zero until J→1
    val hard = rows.find(r => r.getInt(0) == 1 &&
      math.abs(r.getDouble(2) - 0.5) < 1e-9).get.getDouble(3)
    assert(hard < 0.001, "1 band of 16 rows passes only near-identical pairs")
  }

  test("clusterPurityReport: majority, purity, and the smaller-label tie break") {
    val rows = Seq(
      (1L, 10, 0), (2L, 10, 0), (3L, 10, 0), (4L, 10, 1),   // cell 10: 3×0, 1×1
      (5L, 20, 5), (6L, 20, 7),                              // cell 20: 1×5, 1×7 tie
      (7L, 30, 2)                                            // cell 30: pure
    ).toDF("id", "cell", "label")
    val got = CorpusReports.clusterPurityReport(rows, "cell", "label")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getInt(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(10) == ((4L, 0, 3L, 0.75)))
    assert(got(20) == ((2L, 5, 1L, 0.5)), "tie must break to the smaller label")
    assert(got(30) == ((1L, 2, 1L, 1.0)))
  }

  test("sourcePairMatrix: unordered source pairs, diagonal = within-source") {
    val meta = Seq((1L, "web"), (2L, "web"), (3L, "books"), (4L, "books"),
      (5L, "mirror")).toDF("id", "src")
    val pairs = Seq(
      (1L, 2L),            // web-web (diagonal)
      (1L, 3L), (3L, 2L),  // web-books BOTH orders -> one unordered cell
      (4L, 5L)             // books-mirror
    ).toDF("doc_a", "doc_b")
    val got = CorpusReports.sourcePairMatrix(pairs, meta, "id", col("src"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got(("web", "web")) == 1L)
    assert(got(("books", "web")) == 2L, "orders must fold into one cell")
    assert(got(("books", "mirror")) == 1L)
    assert(got.size == 3)
  }

  test("exactDupRateReport: corpus-wide fingerprint counts, per-source rates") {
    val docs = Seq(
      ("s1", "alpha"), ("s1", "beta"), ("s1", "alpha"),  // within-source dup
      ("s2", "alpha"),                                    // cross-source dup
      ("s2", "gamma")                                     // unique
    ).toDF("src", "text")
    val got = graft.ops.CorpusReports.exactDupRateReport(docs, col("src"),
        col("text"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // "alpha" occurs 3× corpus-wide: both s1 copies AND s2's count
    assert(got("s1") == ((3L, 2L, 0.666667)))
    assert(got("s2") == ((2L, 1L, 0.5)))
  }

  test("gopherFunnel: rule counts are exact and pass_all equals gopherReport's keep count") {
    import graft.ops.TextAnalysis
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"), // clean
      (2L, "abc abc abc abc abc abc abc abc abc abc"), // top-word + bigram spam
      (3L, "1 2 3 4 5 6 7 8 9 10"),                    // non-alpha, short words
      (4L, "spam eggs spam bacon spam toast beans")    // top-word 3/7, bigrams distinct
    ).toDF("doc_id", "text")
    val f = TextAnalysis.gopherFunnel(docs, "doc_id", col("text")).head()
    assert(f.getLong(0) == 4L, "population")
    // rule-by-rule: doc3 fails word-len (mwl ~1.1) and alpha; doc2
    // fails top-word (10/10) and bigram (9/9); doc4 fails top-word
    assert(f.getLong(1) == 1L, "fail_word_len = doc3")
    assert(f.getLong(2) == 1L, "fail_alpha = doc3")
    assert(f.getLong(3) == 2L, "fail_top_word = docs 2,4")
    assert(f.getLong(4) == 1L, "fail_top_bigram = doc2")
    // sequential: after_word_len 3 (drop doc3), after_alpha 3,
    // after_top_word 1 (drop 2,4), pass_all 1
    assert((f.getLong(5), f.getLong(6), f.getLong(7), f.getLong(8)) ==
      ((3L, 3L, 1L, 1L)))
    val keepCnt = TextAnalysis.gopherReport(docs, "doc_id", col("text"))
      .filter(col("keep")).count()
    assert(f.getLong(8) == keepCnt, "pass_all must equal q93's keep count")
  }

  test("hapaxReport: exact hapax accounting per source") {
    val docs = Seq(
      ("s1", "a b a c"),     // vocab {a:2, b:1, c:1} — hapax 2 of 3, tokens 4
      ("s1", "a"),           // folds into s1: a:3, b:1, c:1 — hapax 2, tokens 5
      ("s2", "x y z")        // all hapax: 3 of 3, tokens 3
    ).toDF("src", "text")
    val got = CorpusReports.hapaxReport(docs, col("src"), col("text"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(got("s1") == ((3L, 5L, 2L, 0.666667, 0.4)))
    assert(got("s2") == ((3L, 3L, 3L, 1.0, 1.0)))
  }

  test("truncationLossReport: exact token accounting, empty docs included") {
    val docs = Seq("a b c", "a b c d e f", "", "x").toDF("text")
    // token counts: 3, 6, 0, 1 — total 10
    val got = CorpusReports.truncationLossReport(docs, col("text"), Seq(2, 4, 8))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4),
          r.getLong(5), r.getDouble(6)))).toMap
    assert(got(2L) == ((4L, 2L, 0.5, 10L, 5L, 0.5)),
      "L=2: only the empty and 1-token docs fit; kept = 2+2+0+1")
    assert(got(4L) == ((4L, 3L, 0.75, 10L, 8L, 0.8)))
    assert(got(8L) == ((4L, 4L, 1.0, 10L, 10L, 1.0)))
  }

  test("lengthPercentilesReport: nearest-rank exactness, ties, labels") {
    // s1: lengths 1..10 — nearest-rank p50 = 5th value = 5,
    // p90 = 9th = 9, p99 = ceil(9.9) = 10th = 10
    val s1 = (1 to 10).map(n => ("s1", Seq.fill(n)("w").mkString(" ")))
    // s2: all docs the same length — every percentile lands on 4
    val s2 = Seq.fill(7)(("s2", "a b c d"))
    val docs = (s1 ++ s2).toDF("src", "text")
    val got = CorpusReports.lengthPercentilesReport(
        docs, col("src"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got(("s1", "p50")) == ((10L, 5L)))
    assert(got(("s1", "p90")) == ((10L, 9L)))
    assert(got(("s1", "p99")) == ((10L, 10L)))
    assert(got(("s2", "p50")) == ((7L, 4L)))
    assert(got(("s2", "p99")) == ((7L, 4L)))
    assert(got.size == 6, "exactly one row per (source, pct)")
    // fractional quantile label keeps its decimal; whole ones drop it
    val labels = CorpusReports.lengthPercentilesReport(
        docs, col("src"), col("text"), pcts = Seq(0.999, 0.25))
      .select(col("pct")).distinct().collect().map(_.getString(0)).toSet
    assert(labels == Set("p99.9", "p25"))
    // distinct quantiles that collide after 1-decimal label rounding
    // (0.999 vs 0.9994) must be rejected, not emitted under one label
    val ex = intercept[IllegalArgumentException] {
      CorpusReports.lengthPercentilesReport(
        docs, col("src"), col("text"), pcts = Seq(0.999, 0.9994))
    }
    assert(ex.getMessage.contains("collide"))
  }

  test("heapsCurve: exact first-occurrence accounting") {
    // stream in doc_id order: a b a | b c | c d — N=7 tokens;
    // first positions a:0 b:1 c:4 d:6
    val docs = Seq((1L, "a b a"), (2L, "b c"), (3L, "c d"))
      .toDF("doc_id", "text")
    // K = N: every checkpoint adds exactly one token
    val got = CorpusReports.heapsCurve(docs, "doc_id", col("text"),
        checkpoints = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.map(_._2).toSeq == (1L to 7L), "tokens_seen = k when K = N")
    assert(got.map(_._3).toSeq == Seq(1L, 2L, 2L, 2L, 3L, 3L, 4L))
    // K=2: ceil(7/2)=4 tokens → {a,b}; full stream → all 4 words
    val halves = CorpusReports.heapsCurve(docs, "doc_id", col("text"),
        checkpoints = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(halves(1L) == ((4L, 2L)))
    assert(halves(2L) == ((7L, 4L)))
  }

  test("thresholdSweep: exact dense counts both directions; nulls never pass") {
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("b", Some(2.0)), ("b", None)).toDF("src", "score")
    // keep-below (neg-log-likelihood direction)
    val lo = CorpusReports.thresholdSweep(df, col("src"), col("score"),
        Seq(1.5, 2.5), keepBelow = true)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"),
          r.getAs[Double]("keep_rate")))).toMap
    assert(lo.size == 4) // dense: every (group, threshold)
    assert(lo(("a", 1.5)) == ((3L, 1L, 0.333333)))
    assert(lo(("a", 2.5)) == ((3L, 2L, 0.666667)))
    // null score: counted in n_docs, passes NO gate
    assert(lo(("b", 1.5)) == ((2L, 0L, 0.0)))
    assert(lo(("b", 2.5)) == ((2L, 1L, 0.5)))
    // keep-above (classifier-posterior direction), boundary inclusive
    val hi = CorpusReports.thresholdSweep(df, col("src"), col("score"),
        Seq(2.0))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_kept")).toMap
    assert(hi == Map("a" -> 2L, "b" -> 1L)) // score == t kept
  }

  test("tokenizerFertilityReport: exact counts, both ratios, zero-word group") {
    // s1: "ab cd" (2 words, bpe [ab,cd]=2, 5 chars) +
    //     "x9,y"  (1 whitespace word, bpe [x|9|,|y]=4, 4 chars)
    // s2: "hello world" (2 words, 2 bpe, 11 chars)
    // s3: "" (0 words, 0 bpe, 0 chars) → both ratios NULL, never 0/0
    val docs = Seq(("ab cd", "s1"), ("x9,y", "s1"),
      ("hello world", "s2"), ("", "s3")).toDF("text", "src")
    val r = CorpusReports.tokenizerFertilityReport(docs, col("src"),
        col("text"))
      .collect().map(x => x.getString(0) -> x).toMap
    val s1 = r("s1")
    assert(s1.getAs[Long]("n_docs") == 2L && s1.getAs[Long]("words") == 3L &&
      s1.getAs[Long]("bpe_tokens") == 6L && s1.getAs[Long]("chars") == 9L)
    assert(s1.getAs[Double]("fertility") == 2.0 &&
      s1.getAs[Double]("chars_per_token") == 1.5)
    val s2 = r("s2")
    assert(s2.getAs[Long]("words") == 2L && s2.getAs[Long]("bpe_tokens") == 2L)
    assert(s2.getAs[Double]("fertility") == 1.0 &&
      s2.getAs[Double]("chars_per_token") == 5.5)
    val s3 = r("s3")
    assert(s3.getAs[Long]("n_docs") == 1L && s3.getAs[Long]("words") == 0L)
    assert(s3.isNullAt(s3.fieldIndex("fertility")) &&
      s3.isNullAt(s3.fieldIndex("chars_per_token")))
  }
}
