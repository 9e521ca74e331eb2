package graft.ops

import org.apache.spark.sql.DataFrame

/** Registry of the localCheckpoint blocks that back RETURNED
  * DataFrames.
  *
  * Ops that pin an intermediate and free it before returning
  * (`NearDup.freeLocalCheckpoint` at every loop step) need nothing
  * here. Ops whose RESULT is checkpoint-backed — `Graph.pageRank`'s
  * final rank table, `NearDup.connectedComponents`' final labels,
  * `TextAnalysis.ppxBands`' scored LM table — cannot free before
  * returning: a local checkpoint truncates lineage, so its blocks
  * must outlive the last consumer read. Their contract is "the
  * consumer releases it", and this object is how a long-lived
  * consumer does that without tracking frames by hand.
  *
  * `spark.catalog.clearCache()` does NOT cover these blocks: they are
  * RDD-level persists, not cache-manager entries — which is exactly
  * how a bench suite that clears the cache between passes still
  * accumulated one pinned copy of the q155 LM table per pass for the
  * JVM lifetime (r17 ADVICE). `Bench.runOnce` and the `Verify` loop
  * now drain this registry after every query's result is written.
  *
  * Releasing is unpersist-based: double-release, or releasing a frame
  * some other op already freed (LabelStore frees the CC labels it
  * consumes), is a harmless no-op. The only misuse is releasing
  * BEFORE the frame's last action — a lineage-truncated frame cannot
  * recompute — which is why only result-consuming harness code calls
  * `releaseAll`, never the ops themselves.
  */
object Pinned {

  private val reg = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Track a checkpoint-backed result frame; returns it unchanged. */
  private[graft] def track(df: DataFrame): DataFrame = { reg.add(df); df }

  /** How many results are currently tracked (spec observability). */
  def trackedCount: Int = reg.size()

  /** Unpersist every tracked result's checkpoint blocks. Call only
    * after the frames have been fully consumed (written/collected). */
  def releaseAll(): Unit = {
    var df = reg.poll()
    while (df != null) {
      NearDup.freeLocalCheckpoint(df)
      df = reg.poll()
    }
  }
}
