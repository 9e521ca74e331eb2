package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Q

/** Pins the loader against the REAL driver testdata, so a silent
  * regeneration of /root/testdata with a changed physical schema fails
  * one named test with an obvious message instead of breaking a dozen
  * queries at driver time (round 10: events.ts drifted TIMESTAMP(NANOS)
  * → timestamp[us] and took 12 queries down).
  */
class TestdataContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private def present = new java.io.File(sf).isDirectory

  private val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  test("all contract tables resolve at sf0.001") {
    assume(present, s"$sf not present")
    tables.foreach { name =>
      val df = Q.t(spark, sf, name)
      assert(df.schema.nonEmpty, s"$name: empty schema")
      assert(df.limit(1).count() == 1, s"$name: no rows")
    }
  }

  test("Q.events adapts to the observed ts type and yields sane ts_ms") {
    assume(present, s"$sf not present")
    val ev = Q.events(spark, sf)
    assert(ev.schema("ts_ms").dataType == org.apache.spark.sql.types.LongType)
    val row = ev.selectExpr(
      "count(*) AS n", "count(ts_ms) AS nn", "min(ts_ms) AS lo", "max(ts_ms) AS hi").head()
    assert(row.getLong(0) > 0)
    assert(row.getLong(1) == row.getLong(0), "ts_ms has nulls")
    // epoch millis in [2000-01-01, 2100-01-01) — catches unit mistakes
    // (nanos or micros mis-scaled by 1e3/1e6 land far outside this band).
    assert(row.getLong(2) >= 946684800000L, s"ts_ms min ${row.getLong(2)} below year-2000")
    assert(row.getLong(3) < 4102444800000L, s"ts_ms max ${row.getLong(3)} beyond year-2100")
  }

  test("documents/embeddings expose the columns the ops stack assumes") {
    assume(present, s"$sf not present")
    val docCols = Q.t(spark, sf, "documents").schema.fieldNames.toSet
    Seq("doc_id", "text", "source", "lang").foreach(c =>
      assert(docCols.contains(c), s"documents missing $c"))
    val embCols = Q.t(spark, sf, "embeddings").schema.fieldNames.toSet
    Seq("vec_id", "embedding", "label").foreach(c =>
      assert(embCols.contains(c), s"embeddings missing $c"))
  }

  test("embeddings.embedding ships as array<float> (vector-kernel contract)") {
    assume(present, s"$sf not present")
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    // Raw read on purpose: Q.t normalizes a drifted element type to
    // array<float> so queries keep running, but a drift still changes
    // score precision vs the DuckDB oracle (which reads the parquet
    // natively). This test is the loud signal that the physical type
    // moved and oracle parity must be re-checked deliberately.
    val raw = spark.read.parquet(s"$sf/embeddings.parquet")
    raw.schema.find(_.name == "embedding").map(_.dataType) match {
      case Some(ArrayType(FloatType, _)) => ()
      case other => fail(
        s"embeddings.embedding is $other, not array<float>: Q.t now casts it " +
          "so vector queries still run, but float-vs-double score rounding vs " +
          "the DuckDB oracle must be re-verified (see Q.normalizeEmbedding)")
    }
  }

  test("documents.text carries no U+000B/U+0001; doc_ids stay below the planted-copy offsets (r18 ADVICE)") {
    import org.apache.spark.sql.functions._
    // Three latent cross-engine hazards, asserted ONCE against every
    // SF instead of defended at each of the ~40 sites that assume
    // them:
    //  - U+000B (vertical tab): Java-regex \s+ (the engine's split)
    //    treats it as whitespace, RE2's \s+ (DuckDB string_split_regex)
    //    does not — a fixture VT would silently diverge every token
    //    histogram (Bpe, NearDup.tokens, the NB/DSIR tokenizers).
    //  - U+0001: BpeSpec's naive reference encodes token state
    //    SEP-joined with SEP = U+0001; a fixture 0x01 would corrupt
    //    the cross-check silently instead of failing it.
    //  - doc_id >= 1e6: q163/q165 plant duplicate pages at doc_id +
    //    1e6/2e6 — a real id in that range would collide with planted
    //    ids and silently break the 'exactly N planted dupes'
    //    accounting (both engines identically, so hash-green).
    Seq("0.001", "0.01", "0.1").foreach { s =>
      val dir = s"/root/testdata/sf$s"
      assume(new java.io.File(dir).isDirectory, s"$dir not present")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val bad = docs.filter(col("text").contains("\u000B") ||
        col("text").contains("\u0001")).count()
      assert(bad == 0, s"sf$s: $bad docs contain U+000B/U+0001 — " +
        "re-adjudicate every \\s+ tokenizer site and NaiveBpe's SEP")
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      assert(maxId < 1000000L, s"sf$s: max doc_id $maxId collides with " +
        "q163/q165's planted-copy offsets (+1e6/+2e6)")
    }
  }

  test("embeddings are uniform-dim at every SF (PQ ragged-dim contract, r19 ADVICE)") {
    import org.apache.spark.sql.functions._
    // PqEncode emits code 0 for subspaces entirely past a short
    // vector's end (every centroid distance is 0.0), while the q166
    // DuckDB oracle simply has no (vec_id, subspace) rows there — a
    // ragged-dim fixture would hash-DIVERGE rather than degrade
    // identically. The engine deliberately keeps the degrade-don't-
    // throw kernel (an embedder change in production must not kill
    // the job); the ORACLE contract is pinned here once instead:
    // every PQ/IVF/PCA oracle may assume one corpus-wide dim.
    Seq("0.001", "0.01", "0.1").foreach { s =>
      val dir = s"/root/testdata/sf$s"
      assume(new java.io.File(dir).isDirectory, s"$dir not present")
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("embedding").isNotNull)
      val dims = emb.select(size(col("embedding")).as("d"))
        .distinct().collect().map(_.getInt(0)).toSeq
      assert(dims.length == 1, s"sf$s: embeddings carry mixed dims " +
        s"$dims — the PQ-family oracles assume uniform dim (q166 " +
        "omits past-end subspace rows where PqEncode emits code 0)")
    }
  }
}
