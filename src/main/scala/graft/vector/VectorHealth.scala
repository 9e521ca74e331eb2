package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Index-ingest health checks for an embedding column — the gate an
  * embedding pipeline runs BEFORE vectors reach a store or quantizer:
  * ragged dimensions, zero vectors (un-normalizable, poison cosine),
  * NaN payloads (poison every distance they touch), and the norm
  * range (a drifting embedder shows up as a norm spread long before
  * recall metrics move). Complements `AdapterContractSpec`, which
  * pins the adapter seam at build time; this op audits actual data at
  * run time.
  */
object VectorHealth {

  /** One-row corpus summary. All counts are integer-exact; the norm
    * extrema are per-row index-order sums (deterministic — no
    * cross-row float accumulation, which is why there is no mean
    * here: min/max are reorder-safe, a fp mean is not). NaN vectors
    * are EXCLUDED from the extrema (their norm is NaN, which Spark
    * orders above every double — one poisoned vector would otherwise
    * report max_norm = NaN and erase the drift signal exactly when
    * the report is needed); they are still counted in `nan_vecs`.
    *
    * Scale: one map-side projection + one aggregation; nothing
    * shuffles but partial-agg rows. */
  def embeddingHealthReport(df: DataFrame, vec: Column,
      roundTo: Int = 6): DataFrame = {
    val dim = size(vec)
    val isZero =
      array_max(transform(vec, x => abs(x.cast("double")))) === lit(0.0)
    val hasNan = exists(vec, x => isnan(x.cast("double")))
    val norm = sqrt(aggregate(vec, lit(0.0),
      (a, x) => a + x.cast("double") * x.cast("double")))
    df.select(dim.as("__d"), isZero.as("__z"), hasNan.as("__nan"),
        norm.as("__nrm"))
      .agg(count(lit(1)).as("n_vecs"),
        countDistinct(col("__d")).as("n_dims_distinct"),
        min(col("__d")).as("min_dim"),
        max(col("__d")).as("max_dim"),
        sum(when(col("__z"), 1L).otherwise(0L)).as("zero_vecs"),
        sum(when(col("__nan"), 1L).otherwise(0L)).as("nan_vecs"),
        round(min(when(!col("__nan"), col("__nrm"))), roundTo)
          .as("min_norm"),
        round(max(when(!col("__nan"), col("__nrm"))), roundTo)
          .as("max_norm"))
  }

  /** Per-vector int8 reconstruction error for `Quantize`'s symmetric
    * scheme: MSE and max absolute element error against the
    * dequantized vector, plus the scale — the table that prices the
    * 4× storage cut before a collection flips to int8. Zero vectors
    * (scale 0) are excluded, as in the quantize path itself.
    *
    * Per-row arithmetic only (index-order sums), so results are
    * partitioning-independent; emitting per-vector rows instead of a
    * corpus mean keeps the report free of cross-row fp accumulation
    * AND shows the worst vectors individually (a corpus mean hides
    * exactly the outliers one needs to see). */
  def quantizationErrorReport(df: DataFrame, id: String, vec: Column,
      roundTo: Int = 6): DataFrame = {
    val withScale = df.withColumn("__m", Quantize.scaleOf(vec))
      .filter(col("__m") > 0)
      .withColumn("__rv",
        Quantize.dequantize(Quantize.quantize(vec, col("__m")), col("__m")))
    val errs = zip_with(vec, col("__rv"),
      (a, b) => a.cast("double") - b.cast("double"))
    withScale.select(col(id),
      round(aggregate(transform(errs, e => e * e), lit(0.0), _ + _)
        / size(vec), roundTo).as("mse"),
      round(array_max(transform(errs, e => abs(e))), roundTo)
        .as("max_abs_err"),
      round(col("__m"), roundTo).as("scale"))
  }
}
