package graft.vector

import org.apache.spark.sql.{Column, DataFrame}

/** Pluggable cell assignment for the semantic-dedup family (SemDedup
  * pairs / kNN graph / drop): the one seam where the O(N·k) flat scan
  * vs the O(N·2√k) two-level quantizer is chosen. Queries pick the
  * two-level form once k is corpus-scaled (SemDedup.cellCountFor ties
  * k ∝ N, which makes flat assignment O(N²/cellSize) total — the
  * 100 TB wall); flat stays right for small fixed k.
  */
sealed trait Quantizer {
  /** Attach the integer cell id (null for null vectors). */
  def attach(df: DataFrame, vec: Column, as: String = "ivf_cell"): DataFrame
}

/** Flat nearest-of-k scan against broadcast centroids: per-row
  * O(k·dim). */
final case class FlatQuantizer(cents: Array[Array[Float]]) extends Quantizer {
  def attach(df: DataFrame, vec: Column, as: String = "ivf_cell"): DataFrame =
    Ivf.assignCells(df, vec, cents, as)
}

/** Coarse→fine two-level quantizer: per-row O((√k + k/√k)·dim).
  * `coarse` is typically `fine.take(Ivf.coarseCountFor(fine.length))`
  * under the shared id-prefix seed rule, so one bounded collect feeds
  * both levels. */
final case class TwoLevelQuantizer(fine: Array[Array[Float]],
    coarse: Array[Array[Float]]) extends Quantizer {
  def attach(df: DataFrame, vec: Column, as: String = "ivf_cell"): DataFrame =
    Ivf.assignCellsTwoLevel(df, vec, fine, coarse, as)
}
