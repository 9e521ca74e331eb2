package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed co-located joins (100 TB posture): write both sides
  * bucketed+sorted on the join key and the join needs NO exchange at
  * read time — the shuffle is paid once at write, amortized over every
  * subsequent join/agg on that key. The right layout for the engine's
  * recurring keys (video/file id, article id, vector id).
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Join two bucketed tables on their bucket key — plans as a
    * shuffle-free sort-merge join when bucket specs line up. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}
