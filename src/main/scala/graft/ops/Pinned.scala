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
  *
  * The registry is THREAD-scoped (the NearDup ThreadLocal-listener
  * discipline): `releaseAll` drains only frames the CALLING thread's
  * ops tracked. The harnesses construct and consume each query on one
  * thread, so they see every frame; parallel ScalaTest suites sharing
  * the session cannot free each other's in-flight checkpoints (a
  * global drain did exactly that — one suite's releaseAll unpersisted
  * another suite's not-yet-consumed labels mid-run).
  */
object Pinned {

  private val reg =
    ThreadLocal.withInitial[java.util.ArrayDeque[java.lang.ref.WeakReference[DataFrame]]](
      () => new java.util.ArrayDeque[java.lang.ref.WeakReference[DataFrame]]())

  /** Track a checkpoint-backed result frame; returns it unchanged.
    * The registry holds WEAK references: a thread that never drains
    * (a test thread, a streaming micro-batch thread whose ops free
    * their own pins) must not keep the frame reachable forever —
    * once the caller drops it, the ContextCleaner's GC-driven
    * unpersist path takes over exactly as it did before the registry
    * existed. Only a live, still-referenced frame is drained by
    * `releaseAll`. */
  private[graft] def track(df: DataFrame): DataFrame = {
    val q = reg.get()
    q.add(new java.lang.ref.WeakReference(df))
    // bound the ref-queue itself for never-draining threads
    while (q.size > 256) q.removeFirst()
    df
  }

  /** How many still-live results this thread currently tracks (spec
    * observability). */
  def trackedCount: Int = {
    val it = reg.get().iterator()
    var n = 0
    while (it.hasNext) if (it.next().get() != null) n += 1
    n
  }

  /** Unpersist every still-live result tracked BY THIS THREAD. Call
    * only after the frames have been fully consumed
    * (written/collected). */
  def releaseAll(): Unit = {
    val q = reg.get()
    var ref = q.poll()
    while (ref != null) {
      val df = ref.get()
      if (df != null) NearDup.freeLocalCheckpoint(df)
      ref = q.poll()
    }
  }
}
