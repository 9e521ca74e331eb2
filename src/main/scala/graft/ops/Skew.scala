package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY §7.5.8, 100 TB posture).
  * AQE's skew-join split handles most cases at runtime; these are the
  * explicit tools for the pathological ones (a single key holding >>
  * one partition's worth of rows — e.g. the empty-string document, a
  * null-ish URL, one dominant source).
  */
object Skew {

  /** Two-phase (salted) aggregation: pre-aggregate on (key, salt),
    * then final-aggregate on key. Spark's hash aggregate already does
    * partial aggregation map-side, which covers sum/count-style aggs;
    * explicit salting is for aggregations whose partial state is large
    * (collect_list/distinct-heavy) where one reducer would otherwise
    * hold the whole hot key. */
  def saltedTwoPhase(df: DataFrame, key: Column, salts: Int)(
      partial: Seq[Column], finalAgg: Seq[Column]): DataFrame = {
    require(salts > 0)
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(key.as("__key"), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col("__key"))
      .agg(finalAgg.head, finalAgg.tail: _*)
  }

  /** Salted broadcast-style join for a skewed probe side against a
    * replicable build side: the build side is exploded `salts`× with a
    * salt column, the probe side gets a random salt in [0, salts), and
    * the join key becomes (key, salt) — splitting each hot key across
    * `salts` reducers. Build side must be small enough to replicate
    * (it is, for every reference join — state tables and listings). */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    // the build side is replicated salts-x, so any join type that
    // preserves unmatched BUILD rows would emit them salts times
    val jt = joinType.toLowerCase(java.util.Locale.ROOT).replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti", "cross")(jt),
      s"saltedJoin: joinType '$joinType' preserves unmatched build rows, " +
        "which the salted replication would multiply - use an unsalted join")
    val saltedProbe = probe.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salts)))
    val saltedBuild = build
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedProbe.join(saltedBuild, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
