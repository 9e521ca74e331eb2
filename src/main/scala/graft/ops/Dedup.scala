package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expr.Functions

/** Dedup / incremental-delta primitives (SURVEY.md §2.4 J4/J5, §2.7 T4).
  * These are the engine's core incremental-execution operators: the
  * reference re-lists the world every run and anti-joins away what is
  * already materialized. All are key-partitioned shuffles (or broadcast
  * when the seen-side is small) — no driver-side sets.
  */
object Dedup {

  /** J4 — seen-set anti join (ref newscrawler.py:125-127, 366-369):
    * drop rows whose key already exists in `seen`. */
  def antiJoinSeen(fresh: DataFrame, seen: DataFrame, freshKey: Column,
      seenKey: Column): DataFrame =
    fresh.join(seen, freshKey === seenKey, "left_anti")

  /** J5 — work-list anti join against an output inventory
    * (ref transcribe_council.py:119,127; summarize.py:174): only rows
    * with no materialized output remain. */
  def pendingWork(workList: DataFrame, outputs: DataFrame,
      key: Seq[String]): DataFrame =
    workList.join(outputs.select(key.map(col): _*), key, "left_anti")

  /** J6 — semi join guard: keep only rows whose prerequisite exists. */
  def withPrerequisite(workList: DataFrame, prereqs: DataFrame,
      key: Seq[String]): DataFrame =
    workList.join(prereqs.select(key.map(col): _*), key, "left_semi")

  /** T4 — deterministic key dedup: keep the first row per key by an
    * explicit order (pandas "first seen wins" made order-explicit —
    * SURVEY.md §7.5.1). One shuffle on the key. */
  def firstPerKey(df: DataFrame, key: Seq[String], order: Column*): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact content dedup: group by content hash, keep min key.
    * Hash-groupBy shuffles on sha16(content) — uniform keys, no skew. */
  def exactDedup(df: DataFrame, content: Column, keeperKey: Column): DataFrame =
    df.groupBy(Functions.sha16(content).as("content_hash"))
      .agg(min(keeperKey).as("keeper"), count(lit(1)).as("n_copies"))

  /** MERGE-by-id upsert semantics (ref: Chroma add "duplicates are
    * updated", article_vectorize.py:360-363): updates win, untouched
    * state rows carry over. Anti join + union — both shuffle on id. */
  def mergeById(state: DataFrame, updates: DataFrame, key: Seq[String]): DataFrame =
    updates.unionByName(state.join(updates.select(key.map(col): _*), key, "left_anti"))

  /** J4 at crawl scale: seen-set anti join with a Bloom-filter
    * pre-pass. The `seen` keys aggregate into one Bloom sketch
    * (distributed build, driver holds only the bitset — ~1.2 MB per
    * million keys at 1% fpp), which broadcasts and splits `fresh`
    * map-side: "definitely new" rows (the overwhelming majority in an
    * incremental crawl) bypass the join entirely; only "maybe seen"
    * rows — true dups plus the fpp sliver of false positives — enter
    * the residual anti join. Result is EXACTLY the plain anti join
    * (Bloom filters have no false negatives; false positives only
    * route extra rows through the residual join), so the op stays
    * oracle-checkable while the shuffle carries ~(dup_rate + fpp) of
    * the input instead of all of it.
    *
    * Null keys never match a join condition, so the anti join keeps
    * them; the probe maps null → "definitely new" to agree.
    * `expectedItems` may be overestimated freely (larger bitset);
    * underestimating only raises the false-positive rate — more
    * residual-join traffic, same answer. At seen-sets too large for
    * one broadcast sketch (≫10⁹ keys), fall back to the plain
    * anti join — it is the same answer, one shuffle. */
  def bloomPrefilteredAntiJoin(fresh: DataFrame, key: String, seen: DataFrame,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    val seenKeys = seen.select(col(key))
    val bf = seenKeys.stat.bloomFilter(key, expectedItems, fpp)
    val bc = fresh.sparkSession.sparkContext.broadcast(bf)
    val might = fresh.schema(key).dataType match {
      case StringType =>
        udf((k: String) => k != null && bc.value.mightContainString(k))
      case LongType =>
        udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
      case IntegerType =>
        udf((k: java.lang.Integer) =>
          k != null && bc.value.mightContainLong(k.longValue()))
      case other =>
        throw new IllegalArgumentException(
          s"bloomPrefilteredAntiJoin: unsupported key type $other")
    }
    val definitelyNew = fresh.filter(!might(col(key)))
    val maybeSeen = fresh.filter(might(col(key)))
    definitelyNew.unionByName(maybeSeen.join(seenKeys, Seq(key), "left_anti"))
  }
}
