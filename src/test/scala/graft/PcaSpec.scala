package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.vector.{Pca, PcaModel}

/** Pins for the embedding-decorrelation layer (vector/Pca.scala).
  *
  * The q150/q151/q152 oracles check covariance, the trace identity and
  * full-rank rotation-invariance through DuckDB; these pins cover what
  * SQL can't see: orthonormality, the spectral-diagonalization
  * property (projected covariance == diag(lambda)), whitening to
  * identity, reconstruction, determinism, and the map-only plan.
  */
class PcaSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 6
  private val n = 48

  /** Deterministic anisotropic cloud: sha-derived uniforms pushed
    * through per-axis scales so the spectrum is strongly ordered. */
  private def synth(): Seq[(Long, Seq[Float])] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val scales = Array(4.0, 2.5, 1.5, 0.9, 0.4, 0.1)
    (0 until n).map { r =>
      val h = md.digest(s"pca:$r".getBytes("UTF-8"))
      val v = Array.tabulate(dim) { i =>
        val b0 = h(2 * i) & 0xff
        val b1 = h(2 * i + 1) & 0xff
        val u = (b0 * 256 + b1) / 65535.0 - 0.5
        // mix axes so the covariance is non-diagonal
        ((u * scales(i)) + 0.3 * scales((i + 1) % dim) * ((h(12 + i) & 0xff) / 255.0 - 0.5)).toFloat
      }
      (r.toLong, v.toSeq)
    }
  }

  private lazy val df = synth().toDF("vec_id", "embedding")
  private lazy val model: PcaModel = Pca.fit(df, "embedding")

  private def naiveCov(rows: Seq[Seq[Float]]): Array[Array[Double]] = {
    val m = rows.length.toDouble
    val mean = Array.tabulate(dim)(i => rows.map(_(i).toDouble).sum / m)
    Array.tabulate(dim, dim) { (i, j) =>
      rows.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / m
    }
  }

  test("covariance matches the naive per-pair formula") {
    val want = naiveCov(synth().map(_._2))
    val got = Pca.covariance(df, "embedding").collect()
      .map(r => ((r.getLong(0).toInt - 1, r.getLong(1).toInt - 1), r.getDouble(2)))
      .toMap
    assert(got.size == dim * (dim + 1) / 2)
    for (i <- 0 until dim; j <- i until dim)
      assert(math.abs(got((i, j)) - want(i)(j)) < 1e-9,
        s"cov($i,$j): ${got((i, j))} vs ${want(i)(j)}")
  }

  test("components are orthonormal and eigenvalues descend, nonnegative") {
    for (a <- 0 until model.k; b <- a until model.k) {
      val dot = (0 until dim).map(i => model.components(a)(i) * model.components(b)(i)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"G^T G ($a,$b) = $dot")
    }
    model.eigenvalues.sliding(2).foreach { case Array(hi, lo) =>
      assert(hi >= lo - 1e-12, s"eigenvalues not descending: $hi < $lo")
    }
    assert(model.eigenvalues.forall(_ >= 0.0))
  }

  test("trace identity: sum of eigenvalues == total variance") {
    val trace = (0 until dim).map(i => naiveCov(synth().map(_._2))(i)(i)).sum
    assert(math.abs(model.eigenvalues.sum - trace) < 1e-9)
  }

  test("projected data has covariance diag(lambda); whitened has identity") {
    val proj = Pca.project(df, "embedding", model, "pca")
      .select(col("pca")).as[Seq[Double]].collect()
    val m = proj.length.toDouble
    for (a <- 0 until dim; b <- a until dim) {
      val meanA = proj.map(_(a)).sum / m
      val meanB = proj.map(_(b)).sum / m
      val cov = proj.map(p => (p(a) - meanA) * (p(b) - meanB)).sum / m
      val want = if (a == b) model.eigenvalues(a) else 0.0
      assert(math.abs(cov - want) < 1e-9, s"proj cov($a,$b) = $cov want $want")
    }
    val wh = Pca.whiten(df, "embedding", model)
      .select(col("whitened")).as[Seq[Double]].collect()
    for (a <- 0 until dim; b <- a until dim) {
      val meanA = wh.map(_(a)).sum / m
      val meanB = wh.map(_(b)).sum / m
      val cov = wh.map(p => (p(a) - meanA) * (p(b) - meanB)).sum / m
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(cov - want) < 1e-6, s"whitened cov($a,$b) = $cov")
    }
  }

  test("full-rank projection preserves pairwise distances; truncation error shrinks with k") {
    val raw = synth().map(_._2)
    val proj = Pca.project(df, "embedding", model, "pca")
      .orderBy("vec_id").select(col("pca")).as[Seq[Double]].collect()
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for (i <- 0 until 10; j <- i + 1 until 10) {
      val dRaw = raw(i).zip(raw(j)).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
      assert(math.abs(d2(proj(i), proj(j)) - dRaw) < 1e-6,
        s"distance not preserved for ($i,$j)")
    }
    // truncation: mean squared reconstruction error == sum of dropped
    // eigenvalues (the Eckart-Young optimum), so it shrinks as k grows
    val errs = (1 to dim).map { k =>
      val mk = Pca.fit(df, "embedding", k)
      val pk = Pca.project(df, "embedding", mk, "pca")
        .select(col("pca")).as[Seq[Double]].collect()
      pk.map(p => d2(p, p.map(_ * 0)) /* squared norm kept */).sum // captured variance * n
    }
    val tot = model.eigenvalues.sum * n
    (1 to dim).foreach { k =>
      val captured = errs(k - 1)
      val want = model.eigenvalues.take(k).sum * n
      assert(math.abs(captured - want) < 1e-6 * math.max(1.0, want),
        s"captured variance at k=$k: $captured want $want")
      assert(captured <= tot + 1e-6)
    }
  }

  test("fit is deterministic (bit-identical on refit) and sign-fixed") {
    val again = Pca.fit(df, "embedding")
    assert(model.mean.toSeq == again.mean.toSeq)
    assert(model.eigenvalues.toSeq == again.eigenvalues.toSeq)
    assert(model.components.map(_.toSeq).toSeq == again.components.map(_.toSeq).toSeq)
    model.components.foreach { c =>
      val best = c.indices.maxBy(i => (math.abs(c(i)), -i))
      assert(c(best) > 0.0, "sign convention: largest-|entry| positive")
    }
  }

  test("null vectors: skipped in fit, null in projection; ragged dims fail loudly") {
    val withNull = (synth() :+ ((99L, null: Seq[Float]))).toDF("vec_id", "embedding")
    val m2 = Pca.fit(withNull, "embedding")
    assert(m2.n == n && m2.mean.toSeq == model.mean.toSeq)
    val projected = Pca.project(withNull, "embedding", m2, "pca")
      .filter(col("vec_id") === 99L).select(col("pca")).collect()
    assert(projected.head.isNullAt(0))
    val ragged = (synth() :+ ((99L, Seq(1f, 2f)))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] { Pca.fit(ragged, "embedding") }
    assert(ex.getMessage != null)
  }

  test("spectrum: monotone cumulative share ending at 1.0; truncated fit tops out honestly") {
    val rows = Pca.spectrum(spark, model).orderBy("component").collect()
    assert(rows.length == dim)
    val cums = rows.map(_.getDouble(3))
    cums.sliding(2).foreach { case Array(a, b) => assert(b >= a - 1e-12) }
    assert(math.abs(cums.last - 1.0) < 1e-9)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-9)
    // a k=2 model's shares are of TOTAL variance — its curve must end
    // at (λ1+λ2)/trace, never a self-normalized 1.0
    val m2 = Pca.fit(df, "embedding", 2)
    assert(math.abs(m2.totalVariance - model.totalVariance) < 1e-12)
    val cums2 = Pca.spectrum(spark, m2).orderBy("component").collect()
      .map(_.getDouble(3))
    val want = model.eigenvalues.take(2).sum / model.totalVariance
    assert(math.abs(cums2.last - want) < 1e-9)
    assert(want < 0.999, s"synth spectrum too flat for the pin: $want")
  }

  private def assertModelsClose(a: PcaModel, b: PcaModel, tol: Double = 1e-9): Unit = {
    assert(a.n == b.n && a.dim == b.dim && a.k == b.k)
    (0 until a.dim).foreach(i => assert(math.abs(a.mean(i) - b.mean(i)) < tol))
    (0 until a.k).foreach(i =>
      assert(math.abs(a.eigenvalues(i) - b.eigenvalues(i)) < tol))
    for (r <- 0 until a.k; i <- 0 until a.dim)
      assert(math.abs(a.components(r)(i) - b.components(r)(i)) < 1e-6,
        s"component($r)($i)")
  }

  test("incremental: batch-merged moments fit equals the one-shot fit") {
    val all = synth()
    val batches = all.grouped(16).toSeq
    val log = batches.zipWithIndex.map { case (b, k) =>
      Pca.momentsDf(b.toDF("vec_id", "embedding"), "embedding")
        .withColumn("batch", lit(k.toLong))
    }.reduce(_ unionByName _)
    assertModelsClose(Pca.fitFromMoments(log), model)
    // single-row path (no batch column) round-trips too
    assertModelsClose(
      Pca.fitFromMoments(Pca.momentsDf(df, "embedding")), model)
  }

  test("updateMomentsStore: sequential folds equal one-shot; created on first use") {
    val dir = TestSpark.tempDir("pcastore") + "/moments"
    val batches = synth().grouped(16).toSeq
    batches.foreach { b =>
      Pca.updateMomentsStore(spark, dir, b.toDF("vec_id", "embedding"), "embedding")
    }
    val stored = spark.read.parquet(dir)
    assert(stored.count() == 1)
    assertModelsClose(Pca.fitFromMoments(stored), model)
    // an empty/all-null batch folds to nothing: a no-op, not a crash
    Pca.updateMomentsStore(spark, dir,
      Seq((999L, null: Seq[Float])).toDF("vec_id", "embedding"), "embedding")
    assertModelsClose(Pca.fitFromMoments(spark.read.parquet(dir)), model)
  }

  test("pcaMomentsSink: streamed moments log fits like the batch fit; empty tick is a no-op") {
    import graft.streaming.Streams
    val dir = TestSpark.tempDir("pcastream")
    val batches = synth().grouped(16).toSeq
    batches.zipWithIndex.foreach { case (b, k) =>
      b.toDF("vec_id", "embedding").coalesce(1).write.parquet(s"$dir/in/f=$k")
    }
    // one all-null tick: must produce no moments row and not kill the query
    Seq((999L, null: Seq[Float])).toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$dir/in/f=${batches.size}")
    val schema = spark.read.parquet(s"$dir/in/f=0").schema
    val stream = Streams.fileStream(spark, s"$dir/in/*/", schema,
      maxFilesPerTrigger = 1)
    val q = Streams.pcaMomentsSink(stream, "embedding", s"$dir/store",
      s"$dir/ckpt").start()
    q.awaitTermination()
    val log = spark.read.parquet(s"$dir/store")
    assert(log.count() == batches.size.toLong) // the null tick wrote nothing
    assertModelsClose(Pca.fitFromMoments(log), model)
    // re-running with the same checkpoint re-delivers nothing: store unchanged
    val q2 = Streams.pcaMomentsSink(
      Streams.fileStream(spark, s"$dir/in/*/", schema, maxFilesPerTrigger = 1),
      "embedding", s"$dir/store", s"$dir/ckpt").start()
    q2.awaitTermination()
    assertModelsClose(Pca.fitFromMoments(spark.read.parquet(s"$dir/store")), model)
    // per-batch partition overwrite: a crash-window replay of one tick
    // rewrites the identical row instead of double-counting (file
    // pickup order is the source's business — replay whatever tick
    // actually landed as batch=0)
    val row0 = spark.read.parquet(s"$dir/store")
      .where(col("batch") === 0).select("n", "sum", "xtx").cache()
    assert(row0.count() == 1)
    row0.write.mode("overwrite").parquet(s"$dir/store/batch=0")
    row0.unpersist()
    assertModelsClose(Pca.fitFromMoments(spark.read.parquet(s"$dir/store")), model)
  }

  // ---- r18: the q150 hash-fragility pins (centered covariance) ----

  /** Unrounded engine covariance as a (i,j) -> cov map. */
  private def covMap(d: org.apache.spark.sql.DataFrame) =
    Pca.covariance(d, "embedding").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap

  test("headroom audit: every covariance cell sits >= 100x the float error bound from a round(.,6) midpoint at all three SFs") {
    // The r17 q150 flake mechanism: the UNCENTERED one-pass statistic
    // left cross-engine noise (~1e-11) the same order as the closest
    // midpoint gap (2.5e-11 at sf0.01). Centered, measured cross-order
    // noise is ~4e-17; this pin keeps the 100x relationship audited
    // against the REAL driver fixtures so a regeneration or a kernel
    // regression that reopens the gap fails loudly here, not as a
    // coin-flip hash in some future round.
    val u = 2.220446049250313e-16 // double ulp
    Seq("0.001", "0.01", "0.1").foreach { sf =>
      val dir = s"/root/testdata/sf$sf"
      assume(new java.io.File(s"$dir/embeddings.parquet").exists(), s"$dir absent")
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.where(col("embedding").isNotNull).count().toDouble
      val cov = covMap(emb)
      val vars = cov.collect { case ((i, j), v) if i == j => i -> v }
      var minRatio = Double.MaxValue
      cov.foreach { case ((i, j), v) =>
        val g = v * 1e6
        val dist = math.abs(g - math.floor(g) - 0.5) * 1e-6
        // two engines, each a length-n float sum of centered products:
        // |err| <= 2 * n*u * sqrt(var_i * var_j)   (Cauchy-Schwarz)
        val bound = 2.0 * n * u * math.sqrt(math.max(vars(i), 1e-300) *
          math.max(vars(j), 1e-300))
        minRatio = math.min(minRatio, dist / bound)
      }
      assert(minRatio >= 100.0,
        f"sf$sf: min distance-to-midpoint / error-bound = $minRatio%.1f < 100")
    }
  }

  test("q150's rounded output contains no IEEE negative zeros at all three SFs") {
    // The r18 hash break: one cell rounded to -0.0 in DuckDB and +0.0
    // in Spark — value-equal, byte-unequal, and the driver hashes
    // bytes. Both sides now normalize with `+ 0.0`; this pin bit-scans
    // the REGISTERED query's actual output (and, belt-and-braces,
    // asserts Spark's HALF_UP path stayed -0.0-free) so a regression
    // fails here instead of as a driver-only hash mismatch.
    val q150 = graft.queries.Registry.all.find(_.name == "q150_embedding_covariance").get
    Seq("0.001", "0.01", "0.1").foreach { sf =>
      val dir = s"/root/testdata/sf$sf"
      assume(new java.io.File(s"$dir/embeddings.parquet").exists(), s"$dir absent")
      val negZeros = q150.fn(spark, dir).collect().count(r =>
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)) == Long.MinValue)
      assert(negZeros == 0, s"sf$sf: $negZeros -0.0 cells in q150 output")
    }
  }

  test("partitioning sweep: the rounded covariance grid is identical at 1/4/32/256 partitions") {
    // Different partitionings re-order the float sums; the centered
    // kernel plus the deterministic fan-in must keep every cell on
    // the same side of its rounding boundary (at these magnitudes the
    // UNROUNDED values coincide to ~1e-15, so this is a cheap full
    // guard, not a lucky one).
    def grid(parts: Int): Map[(Long, Long), Double] =
      covMap(df.repartition(parts)).map { case (k, v) =>
        k -> BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    val base = grid(1)
    Seq(4, 32, 256).foreach { p =>
      assert(grid(p) == base, s"rounded grid differs at $p partitions")
    }
  }

  test("standardize: per-dim mean 0 / var 1, degenerate dims pass through, nulls stay null") {
    val std = Pca.standardize(df, "embedding", "z")
      .select(col("z")).as[Seq[Double]].collect()
    val m = std.length.toDouble
    for (j <- 0 until dim) {
      val mean = std.map(_(j)).sum / m
      val v = std.map(x => (x(j) - mean) * (x(j) - mean)).sum / m
      assert(math.abs(mean) < 1e-12, s"dim $j standardized mean $mean")
      assert(math.abs(v - 1.0) < 1e-9, s"dim $j standardized var $v")
    }
    // a constant dimension (sigma^2 <= eps) passes through centered
    // but UNSCALED instead of dividing by ~0
    val const = synth().map { case (id, v) => (id, v.updated(0, 7.5f)) }
      .toDF("vec_id", "embedding")
    val cz = Pca.standardize(const, "embedding", "z")
      .select(col("z")).as[Seq[Double]].collect()
    assert(cz.forall(z => math.abs(z(0)) < 1e-6), "constant dim must center to ~0 unscaled")
    val withNull = (synth() :+ ((99L, null: Seq[Float]))).toDF("vec_id", "embedding")
    val nz = Pca.standardize(withNull, "embedding", "z")
      .filter(col("vec_id") === 99L).select(col("z")).collect()
    assert(nz.head.isNullAt(0))
  }

  test("standardizeFromMoments: the store-backed z-scoring matches the two-pass direct path") {
    val direct = Pca.standardize(df, "embedding", "z")
      .orderBy("vec_id").select(col("z")).as[Seq[Double]].collect()
    val log = synth().grouped(16).toSeq.zipWithIndex.map { case (b, k) =>
      Pca.momentsDf(b.toDF("vec_id", "embedding"), "embedding")
        .withColumn("batch", lit(k.toLong))
    }.reduce(_ unionByName _)
    val stored = Pca.standardizeFromMoments(log, df, "embedding", "z")
      .orderBy("vec_id").select(col("z")).as[Seq[Double]].collect()
    direct.zip(stored).zipWithIndex.foreach { case ((a, b), r) =>
      a.zip(b).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-6, s"row $r: $x vs $y")
      }
    }
  }

  test("whitening recovers ANN recall under a ROTATED corruption that standardization cannot fix") {
    // q156 hashes the diagonal face (per-dim gain -> standardize
    // recovers) because it is SQL-expressible end to end. This pin is
    // the rotated face the oracle can't see: a rank-1 inflation along
    // the mixed direction a = 1/sqrt(d)*(1..1) — y = x + 39(x.a)a —
    // leaves every per-dim variance equally inflated, so z-scoring
    // changes nothing (measured 0.215 -> 0.215), while full `whiten`
    // (eigenbasis rotation + scale) restores recall against the TRUE
    // neighbors (measured 0.57) at the identical IVF probe budget.
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists(), s"$dir absent")
    import graft.vector.{Ivf, RecallReport}
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .where(col("embedding").isNotNull)
    val d8 = lit(0.125) // 1/sqrt(64)
    val corrupt = emb
      .withColumn("__dot", aggregate(col("embedding"), lit(0.0),
        (acc, e) => acc + e.cast("double")) * d8)
      .select(col("vec_id"), transform(col("embedding"),
        x => (x.cast("double") + lit(39.0) * col("__dot") * d8)
          .cast("float")).as("y"))
    val truth = RecallReport.exactTopK(emb, "vec_id", "embedding",
      emb.where(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qv")),
      "qid", "qv", k = 10)
    def meanRecall(corpus: org.apache.spark.sql.DataFrame, vc: String): Double =
      RecallReport.ivfRecallAtK(corpus, "vec_id", vc,
          corpus.where(col("vec_id") < 20)
            .select(col("vec_id").as("qid"), col(vc).as("qv")),
          "qid", "qv", k = 10,
          cents = Ivf.seedCentroids(corpus, "vec_id", vc, 8),
          nProbe = 2, exact = Some(truth))
        .agg(avg(col("recall"))).head().getDouble(0)
    val raw = meanRecall(corrupt, "y")
    val std = meanRecall(
      Pca.standardize(corrupt, "y", "z")
        .withColumn("z", col("z").cast("array<float>")), "z")
    val mdl = Pca.fit(corrupt, "y")
    val wh = meanRecall(
      Pca.whiten(corrupt, "y", mdl)
        .withColumn("whitened", col("whitened").cast("array<float>")),
      "whitened")
    assert(wh >= raw + 0.2, f"whitened $wh%.3f vs raw $raw%.3f")
    assert(wh >= std + 0.2, f"whitened $wh%.3f vs standardized $std%.3f")
    assert(math.abs(std - raw) < 0.1,
      f"z-scoring must NOT fix a rotated corruption: std $std%.3f raw $raw%.3f")
  }

  test("q156 fixture: standardized IVF recall beats the corrupted-raw recall by a wide margin") {
    // the query's hash pins exact per-query values; this pin states
    // the CLAIM the query exists to make, so a testdata regeneration
    // that accidentally kills the separation fails loudly here
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists(), s"$dir absent")
    val out = graft.SparkEntry.queries("q156_standardized_ivf_recall")(spark, dir)
      .agg(avg(col("raw_recall")), avg(col("std_recall"))).head()
    // the query Pinned-tracks its truth checkpoint for the harness to
    // drain; in a shared test session WE are the harness
    graft.ops.Pinned.releaseAll()
    val (raw, std) = (out.getDouble(0), out.getDouble(1))
    assert(std >= raw + 0.2, f"std $std%.3f vs raw $raw%.3f")
  }

  test("plan: projection and whitening are map-only (no exchange)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    Seq(
      Pca.project(df, "embedding", model, "pca"),
      Pca.whiten(df, "embedding", model),
      Pca.standardize(df, "embedding")
    ).foreach { out =>
      val exchanges = out.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty, out.queryExecution.executedPlan.toString.take(800))
    }
  }
}
