package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark plan plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL over the same parquet tables.
  * Column names are aliased identically on both sides — the driver's
  * compare sorts columns by name before hashing values.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String])

object Q {
  def apply(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(sql))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)

  /** Scratch-state directory for queries that exercise on-disk stores
    * (q94/q164/q173/...): derived from the DATASET dir, so two Verify
    * runs over different SF dirs in the same working directory build
    * disjoint stores instead of clobbering each other mid-query
    * (r19 ADVICE). Still under target/tmp — the git-ignored scratch
    * root every harness already cleans. */
  def stateDir(datasetDir: String, name: String): String =
    s"target/tmp/${datasetDir.replaceAll("[^A-Za-z0-9.]+", "_")
      .stripPrefix("_")}/$name"

  /** Testdata table loader (TESTDATA.md). The nanosAsLong conf lets
    * Spark 4 read parquet TIMESTAMP(NANOS) (as long nanos); it is a
    * no-op for every other physical type, so setting it is always safe. */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/$name.parquet")
    // Scoped to the one table whose contract pins the column: a future
    // table that happens to carry an `embedding` column of some other
    // shape must stay readable for queries that never touch vectors.
    if (name == "embeddings") normalizeEmbedding(df) else df
  }

  /** embeddings.embedding has only ever shipped as list<float>, and the
    * whole vector stack reads it as such (CosineSimilarity's getFloat
    * codegen, the Seq[Float] UDF kernels). If the physical type ever
    * drifts to list<double> — the events.ts round-10 failure mode, a
    * silent testdata regeneration — a loader-edge cast keeps every
    * vector query RUNNING instead of failing analysis in ~20 places.
    * The cast is a no-op against the shipped float data; under drift,
    * scores carry float32 rounding of the cast, which
    * TestdataContractSpec flags loudly so oracle parity is re-checked
    * deliberately rather than discovered at driver time.
    */
  private def normalizeEmbedding(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{ArrayType, FloatType, NumericType}
    df.schema.find(_.name == "embedding").map(_.dataType) match {
      case Some(ArrayType(FloatType, _)) | None => df
      case Some(ArrayType(el: NumericType, _)) =>
        // Loud at driver time: where the contract spec doesn't run
        // (testdata absent), this is the only drift signal — and for
        // long/decimal elements the cast loses precision beyond 2^24.
        System.err.println(
          s"GRAFT: embeddings.embedding drifted to array<${el.simpleString}>; " +
            "casting to array<float> (float32 rounding applies) — " +
            "re-check oracle parity (TestdataContractSpec)")
        df.withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))
      // non-numeric elements (or a non-array column) must fail HERE,
      // loudly — a blanket cast would null-out array<string> elements
      // under non-ANSI semantics and the vector queries would run on
      // garbage instead of erroring
      case Some(other) => throw new IllegalStateException(
        s"embedding column has non-numeric-array type $other; expected array<float>")
    }
  }

  /** events with `ts_ms` (epoch millis, exact long) derived from `ts`.
    *
    * The testdata contract (TESTDATA.md) never pinned the physical type
    * of `events.ts`, and it has shipped both as TIMESTAMP(NANOS) (read
    * as long nanos via nanosAsLong) and as timestamp[us] (surfacing as
    * TIMESTAMP_NTZ). Adapt to whatever is observed:
    *   - long nanos → exact integer `ts div 1000000` (never divide ns
    *     as double: 1.7e18 > 2^53);
    *   - TIMESTAMP / TIMESTAMP_NTZ → `unix_micros(cast(ts as timestamp))
    *     div 1000`. The session TZ is UTC (GraftSession), so the NTZ
    *     cast is wall-clock-safe and matches DuckDB `epoch_ms(ts)`.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = t(s, dir, "events")
    val tsMs = df.schema("ts").dataType match {
      case LongType                        => expr("ts div 1000000")
      case TimestampType | TimestampNTZType =>
        expr("unix_micros(cast(ts as timestamp)) div 1000")
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other; expected long nanos or timestamp")
    }
    df.withColumn("ts_ms", tsMs)
  }
}
