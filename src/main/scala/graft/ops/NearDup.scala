package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for training-data pipelines: exact hash,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine. The scale
  * path is LSH banding — candidate pairs come from an equi-join on
  * band keys (one shuffle, no O(n²)); the pairwise operators are for
  * bounded candidate sets (post-LSH refinement or small samples).
  *
  * Hashing is sha256-slice based: one sha256 per shingle/word, with
  * independent hash functions taken as disjoint 12-hex-char slices of
  * the digest. That keeps minhash portable (bit-parity with any FIPS
  * sha256, so oracle-checkable) and costs a single digest per token.
  */
object NearDup {

  /** Lowercased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Word n-gram shingles (default bigrams). Callers must filter rows
    * with fewer than n tokens. */
  def shingles(text: Column, n: Int = 2): Column =
    shinglesFromTokens(tokens(text), n)

  /** Shingles over an already-tokenized array column — lets pipelines
    * tokenize once (regex split is the per-row hot spot) and reuse. */
  def shinglesFromTokens(w: Column, n: Int): Column =
    transform(sequence(lit(0), size(w) - lit(n)), i =>
      concat_ws(" ", (0 until n).map(k => element_at(w, i + lit(k + 1))): _*))

  /** MinHash signatures: numHashes minima over sha256 slices of the
    * shingle set. Explode → hash-agg min: partial aggregation makes
    * this map-side-combining, so the shuffle carries one signature row
    * per document, not one row per shingle. */
  def minhashSignatures(df: DataFrame, id: String, text: Column,
      numHashes: Int = 4, shingleSize: Int = 2): DataFrame = {
    require(numHashes >= 1 && numHashes <= 5, "sha256 hex yields 5 12-char slices")
    val exploded = df
      .select(col(id), tokens(text).as("__w"))
      .filter(size(col("__w")) >= shingleSize)
      .select(col(id), explode(shinglesFromTokens(col("__w"), shingleSize)).as("__sh"))
      .withColumn("__h", sha2(col("__sh"), 256))
    val aggs = (0 until numHashes).map(j =>
      min(substring(col("__h"), 1 + 12 * j, 12)).as(s"mh$j"))
    exploded.groupBy(col(id)).agg(aggs.head, aggs.tail: _*)
  }

  /** Fused per-row minhash (custom codegen Expression): signature
    * extraction as a pure projection — no explode, no aggregation, no
    * exchange. Same output as `minhashSignatures` (oracle-checked);
    * prefer this at scale, fall back to the explode+agg composition
    * when custom expressions are off the table. */
  def minhashSignaturesFused(df: DataFrame, id: String, text: Column,
      numHashes: Int = 4, shingleSize: Int = 2): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    val sig = ColumnBridge.column(graft.expr.MinHashSig(
      ColumnBridge.expression(text), numHashes, shingleSize))
    df.select(col(id), sig.as("__mh"))
      .filter(col("__mh").isNotNull) // < shingleSize tokens
      .select(col(id) +: (0 until numHashes)
        .map(j => col(s"__mh.mh$j").as(s"mh$j")): _*)
  }

  /** Production-fast minhash: xxhash64 per (seed, shingle) — ~an order
    * of magnitude cheaper than sha256 and the right default at 100 TB.
    * Not cross-engine reproducible (xxhash64 is Spark-internal), so the
    * oracle-checked queries use the sha256 variant; band/LSH machinery
    * is shared. */
  def minhashSignaturesFast(df: DataFrame, id: String, text: Column,
      numHashes: Int = 4, shingleSize: Int = 2): DataFrame = {
    val exploded = df
      .select(col(id), tokens(text).as("__w"))
      .filter(size(col("__w")) >= shingleSize)
      .select(col(id), explode(shinglesFromTokens(col("__w"), shingleSize)).as("__sh"))
    val aggs = (0 until numHashes).map(j =>
      min(xxhash64(lit(j), col("__sh"))).as(s"mh$j"))
    exploded.groupBy(col(id)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding over minhash signatures: docs sharing any band of
    * rowsPerBand consecutive hashes become candidate pairs. The band
    * join is an equi-join on the band key — shuffle-partitioned,
    * skew-safe (bands are near-unique for non-duplicates).
    *
    * No cache pinned here; the recompute story depends on the
    * signature variant upstream:
    *  - `minhashSignatures` (explode+agg): the subtree ends in the
    *    groupBy exchange, so every band arm / join side replays the
    *    shuffle files via ReusedExchange — the sha pipeline runs once.
    *  - `minhashSignaturesFused` (map-only projection): there is no
    *    exchange to reuse, so the per-row kernel re-runs once per band
    *    arm (nBands × 2 sides worst case). The kernel is cheap and
    *    scan-bound, and profiling shows the fused total still beats
    *    the agg path at nBands=2 — but for wide banding (rowsPerBand=1,
    *    many arms) materialize the signature table first (write it, or
    *    persist explicitly and unpersist after).
    * Either way nothing leaks into a long-lived session. */
  def lshCandidatePairs(sigs: DataFrame, id: String,
      numHashes: Int = 4, rowsPerBand: Int = 2): DataFrame = {
    val nBands = numHashes / rowsPerBand
    val bands = (0 until nBands).map { b =>
      val cols = (0 until rowsPerBand).map(i => col(s"mh${b * rowsPerBand + i}"))
      sigs.select(col(id).as("__id"),
        concat_ws("|", lit(b.toString) +: cols: _*).as("__band"))
    }.reduce(_.unionByName(_))
    val a = bands.as("a")
    val b = bands.as("b")
    a.join(b, col("a.__band") === col("b.__band") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("doc_a"), col("b.__id").as("doc_b"))
      .distinct()
  }

  /** 16-bit SimHash over the token multiset. Word hash = first 4
    * sha256 nibbles; each bit votes ±1; bit set iff vote sum > 0.
    * 16 bits keeps the per-bit vote columns cheap AND the whole
    * computation integer-exact / oracle-portable; widen by slicing
    * more nibbles if a deployment needs 64-bit fingerprints. */
  def simhash(df: DataFrame, id: String, text: Column): DataFrame = {
    val words = df.select(col(id), explode(tokens(text)).as("__w"))
      .withColumn("__h", sha2(col("__w"), 256))
      .withColumn("__hw", conv(substring(col("__h"), 1, 4), 16, 10).cast("int"))
    val votes = (0 until 16).map(i =>
      sum(shiftright(col("__hw"), i) % 2 * 2 - 1).as(s"__s$i"))
    val sh = (0 until 16).map(i =>
      when(col(s"__s$i") > 0, lit(1L << i)).otherwise(lit(0L))).reduce(_ + _)
    words.groupBy(col(id))
      .agg(votes.head, votes.tail: _*)
      .select(col(id), sh.cast("long").as("simhash"))
  }

  /** Enforce the bounded-candidate-set contract of the O(n²) pairwise
    * operators: a mis-wired call on a raw corpus must fail fast with
    * guidance, not launch a cartesian-scale job. The count is one cheap
    * job over the (bounded) input — negligible next to the n² work it
    * gates. */
  private def requireBounded(df: DataFrame, op: String, maxCandidates: Long): Unit = {
    require(maxCandidates > 0, s"$op: maxCandidates must be positive")
    val n = df.count()
    require(n <= maxCandidates,
      s"$op: candidate set has $n rows > maxCandidates=$maxCandidates. " +
        "These pairwise operators are post-LSH refiners — bucket with " +
        "lshCandidatePairs / Similarity.withLshBucket first, or raise " +
        "maxCandidates explicitly if the O(n^2) cost is intended.")
  }

  /** Pairwise token-set Jaccard over a bounded candidate set (use LSH
    * upstream at scale; inputs larger than `maxCandidates` are
    * rejected). Exact-integer intersection/union counts; one double
    * division at the end. */
  def jaccardPairs(df: DataFrame, id: String, text: Column,
      minJaccard: Double, maxCandidates: Long = 10000L): DataFrame = {
    requireBounded(df, "jaccardPairs", maxCandidates)
    // no cache: the distinct's exchange is the subtree every reference
    // below shares (both self-join sides, both size lookups) — Spark's
    // ReusedExchange replays the shuffle files instead of recomputing,
    // with nothing pinned after the query completes
    val w = df.select(col(id).as("__id"), explode(tokens(text)).as("__word"))
      .distinct()
    val sz = w.groupBy(col("__id")).agg(count(lit(1)).as("__sz"))
    val inter = w.as("x")
      .join(w.as("y"), col("x.__word") === col("y.__word") && col("x.__id") < col("y.__id"))
      .groupBy(col("x.__id").as("doc_a"), col("y.__id").as("doc_b"))
      .agg(count(lit(1)).as("__i"))
    val j = col("__i").cast("double") /
      (col("sa.__sz") + col("sb.__sz") - col("__i"))
    inter
      .join(sz.as("sa"), col("doc_a") === col("sa.__id"))
      .join(sz.as("sb"), col("doc_b") === col("sb.__id"))
      .filter(j >= minJaccard)
      .select(col("doc_a"), col("doc_b"), round(j, 6).as("jaccard"))
  }

  /** Cosine over two float-array columns — the codegen'd Catalyst
    * kernel (double accumulation in index order). */
  def cosine(a: Column, b: Column): Column =
    graft.vector.Similarity.cosineSim(a, b)

  /** Embedding near-dup pairs over a bounded candidate set: all pairs
    * with cosine >= threshold. O(n²) — gate with LSH buckets
    * (vector.Similarity) before calling this at scale; inputs larger
    * than `maxCandidates` are rejected. */
  def cosineNearDupPairs(df: DataFrame, id: String, vec: Column,
      threshold: Double, maxCandidates: Long = 10000L): DataFrame = {
    requireBounded(df, "cosineNearDupPairs", maxCandidates)
    val a = df.select(col(id).as("id_a"), vec.as("__va"))
    val b = df.select(col(id).as("id_b"), vec.as("__vb"))
    val cos = cosine(col("__va"), col("__vb"))
    a.join(b, col("id_a") < col("id_b"))
      .filter(cos >= threshold)
      .select(col("id_a"), col("id_b"), round(cos, 6).as("cos_sim"))
  }

  /** Apply candidate pairs as a dedup: drop every row that appears as
    * the LARGER id of any pair (keep-min-id policy). Greedy rather
    * than connected-components: for chains a~b~c it keeps a and drops
    * b,c — the standard corpus-dedup policy (transitive near-dup is
    * treated as dup). One anti join on the id. */
  def dropNearDuplicates(df: DataFrame, id: String,
      pairs: DataFrame): DataFrame =
    df.join(pairs.select(col("doc_b").as(id)).distinct(), Seq(id), "left_anti")

  /** Connected components over a candidate-pair graph by iterative
    * min-label propagation (hash-min) — the grouping step of
    * transitive corpus dedup (CCNet/RefinedWeb-style), with no graph
    * library: each round a node's component becomes the min over its
    * own label, its neighbors' labels, AND its label's label (pointer
    * jumping — turns O(diameter) convergence into O(log diameter),
    * so even pathological duplicate chains converge in a few joins).
    *
    * Scale notes: per iteration = two equi-joins + one agg, all
    * shuffle-partitioned on the id; `localCheckpoint` truncates the
    * otherwise exponentially growing lineage (the standard iterative-
    * join discipline) and the convergence check reads the
    * materialized blocks, not a recompute. Dup clusters in real
    * corpora are tight, so practical runs converge in 2-4 rounds;
    * non-convergence within `maxIterations` throws rather than
    * silently under-merging.
    *
    * Returns one row per node appearing in `pairs`:
    * (node, component = min id reachable). */
  def connectedComponents(pairs: DataFrame, colA: String = "doc_a",
      colB: String = "doc_b", maxIterations: Int = 20): DataFrame = {
    val edges = pairs.select(col(colA).as("src"), col(colB).as("dst"))
      .unionByName(pairs.select(col(colB).as("src"), col(colA).as("dst")))
      .distinct()
    var labels = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("component"))
    var iter = 0
    var done = false
    while (!done) {
      iter += 1
      require(iter <= maxIterations,
        s"connectedComponents: no fixpoint after $maxIterations iterations " +
          "— raise maxIterations (component diameter exceeds 2^n bound)")
      val nbrMin = edges.as("e")
        .join(labels.as("l"), col("e.dst") === col("l.node"))
        .groupBy(col("e.src").as("node")).agg(min(col("l.component")).as("__nbr"))
      val hopMin = labels.as("x")
        .join(labels.as("y"), col("x.component") === col("y.node"))
        .select(col("x.node").as("node"), col("y.component").as("__hop"))
      val next = labels
        .join(nbrMin, Seq("node"), "left")
        .join(hopMin, Seq("node"), "left")
        .select(col("node"),
          least(col("component"),
            coalesce(col("__nbr"), col("component")),
            coalesce(col("__hop"), col("component"))).as("component"),
          col("component").as("__prev"))
        .localCheckpoint() // truncate iterative-join lineage, materialize
      done = next.filter(col("component") =!= col("__prev")).isEmpty
      labels = next.select(col("node"), col("component"))
    }
    labels
  }

  /** Transitive near-dup application: group candidate pairs into
    * connected components and keep only each component's min-id
    * representative — one survivor per duplicate CLUSTER, the policy
    * large dedup runs (CCNet/RefinedWeb-style) use. Differs from the
    * greedy `dropNearDuplicates` whenever two pairs meet only at
    * their larger id: pairs {(a,c),(b,c)} put a,b,c in one component
    * (a~b holds transitively through c), so this keeps a alone, while
    * greedy keeps both a and b — greedy under-merges clusters whose
    * witnessing pairs were pruned (LSH reports a candidate SAMPLE of
    * each cluster's pairs, not its closure). */
  def dropNearDuplicatesTransitive(df: DataFrame, id: String,
      pairs: DataFrame, maxIterations: Int = 20): DataFrame = {
    val losers = connectedComponents(pairs, maxIterations = maxIterations)
      .filter(col("node") =!= col("component"))
      .select(col("node").as(id))
    df.join(losers, Seq(id), "left_anti")
  }

  /** Demo/test helper: append truncated copies of each row (guaranteed
    * near-duplicates) with offset ids. */
  def withMutatedCopies(df: DataFrame, id: String, text: String,
      offset: Long = 1000000L, dropChars: Int = 20): DataFrame =
    df.select(col(id), col(text)).unionByName(
      df.select((col(id) + offset).as(id),
        col(text).substr(lit(1), greatest(length(col(text)) - dropChars, lit(1))).as(text)))
}
