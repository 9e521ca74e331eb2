package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Sinks
import graft.ops.{Dedup, Snapshot}
import graft.vector.{Embed, Embedder}

/** The CDC loop the snapshot/merge operators exist for: keep a
  * parquet-backed vector collection in sync with a corpus that is
  * re-crawled every run, WITHOUT re-embedding the world. Each refresh
  * diffs the new crawl against the previous one on (key, 16-hex
  * content fingerprint) — 24-byte rows through one full-outer join,
  * never document bodies (`Snapshot.snapshotDiff`) — then:
  *
  *   - embeds ONLY `changed ∪ added` documents (embedding is the
  *     expensive stage — a model server at 100 TB — so the per-run
  *     cost is proportional to churn, not corpus size),
  *   - MERGE-upserts those vectors into the state
  *     (`Dedup.mergeById`: updates win, survivors carry over),
  *   - drops `removed` keys,
  *   - swaps the state in place crash-safely (staging + backup
  *     rename, `Sinks.overwriteInPlace`).
  *
  * The reference's pipeline approximates this with its seen-set anti
  * join (article_vectorize.py:360-363 add-with-stable-ids — inserts
  * only; edits and deletions accumulate stale vectors); the four-way
  * diff makes updates and deletions first-class. Invariant
  * (spec-asserted): after refresh, the state equals a from-scratch
  * embed of the current snapshot, while the embedder ran only on the
  * churn.
  */
object IncrementalEmbed {

  /** One refresh pass. `prev` is the snapshot the state was last
    * synced to (empty DataFrame with the same schema for a first
    * run); `curr` is the new crawl. Returns the refreshed state read
    * back from `statePath` (columns: key, embedding). */
  def refresh(spark: SparkSession, statePath: String,
      prev: DataFrame, curr: DataFrame, key: String, content: Column,
      embedder: Embedder): DataFrame = {
    val diff = Snapshot.snapshotDiff(prev, curr, key, content)
    val churn = diff.filter(col("status").isin("added", "changed"))
      .select(col(key))
    val removed = diff.filter(col("status") === "removed").select(col(key))
    // embed only the churn: join back to curr for the bodies — the
    // only place document text flows, and only for changed∪added
    val updates = Embed.withEmbedding(
        curr.join(churn, Seq(key)).select(col(key), content.as("__text")),
        col("__text"), embedder)
      .select(col(key), col("embedding"))
    // one crash-safe merge-and-swap recipe lives in Sinks.mergeInto —
    // deletions ride the same single rewrite as the upserts
    Sinks.mergeInto(spark, statePath, updates, Seq(key),
      deletions = Some(removed))
  }
}
