package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expr.Functions

/** Corpus snapshot diff — the CDC-style delta report between two
  * versions of a table (yesterday's crawl vs today's): which keys were
  * added, removed, changed, or untouched. The reference's pipeline
  * recomputes this implicitly every run via its seen-set anti joins
  * (newscrawler.py:125-127); materializing the full four-way status is
  * what an incremental 100 TB pipeline schedules compaction and
  * re-embedding from.
  *
  * Scale shape: each side reduces to (key, 16-hex content fingerprint)
  * at scan time — the full-outer join shuffles 24-byte rows, never
  * document bodies — and the status is a null/equality check on the
  * joined fingerprints. One shuffle on the key.
  */
object Snapshot {

  /** Per-key status between `prev` and `curr`: `added` (new key),
    * `removed` (key gone), `changed` (content fingerprint differs),
    * `unchanged`. Returns one row per key in either snapshot. */
  def snapshotDiff(prev: DataFrame, curr: DataFrame, key: String,
      content: Column): DataFrame = {
    val p = prev.select(col(key), Functions.sha16(content).as("__prev_fp"))
    val c = curr.select(col(key), Functions.sha16(content).as("__curr_fp"))
    p.join(c, Seq(key), "full_outer")
      .select(col(key),
        when(col("__prev_fp").isNull, lit("added"))
          .when(col("__curr_fp").isNull, lit("removed"))
          .when(col("__prev_fp") =!= col("__curr_fp"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }
}
