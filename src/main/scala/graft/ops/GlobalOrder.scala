package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Global position without a global sort bottleneck. The naive
  * `row_number() OVER (ORDER BY …)` (no partition key) collapses the
  * whole dataset into ONE task; at 100 TB that is the job. The
  * scalable construction: range-partition on the sort keys, number
  * within partitions, and offset by the per-partition counts joined
  * back (broadcast — one row per partition).
  *
  * The range-partitioned frame is persisted before counting:
  * RangePartitioner's boundary sampling is seeded per-RDD, so two
  * separate executions would pick DIFFERENT boundaries and the
  * offsets would not match the final pass. Persisting pins one
  * materialization for both. Callers running this repeatedly should
  * `spark.catalog.clearCache()` between batches.
  */
object GlobalOrder {

  /** Append a 0-based global position by `keys` (which should form a
    * total order — ties across partitions are broken by partition
    * order only). */
  def withGlobalPosition(df: DataFrame, keys: Seq[Column],
      as: String = "pos"): DataFrame = {
    val spark = df.sparkSession
    val parted = df.repartitionByRange(keys: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    // per-partition counts: numPartitions rows — driver-safe
    val counts = parted.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .orderBy(col("__pid")).collect()
    val offsets = counts.map(_.getLong(1)).scanLeft(0L)(_ + _)
    val offsetRows = counts.map(_.getInt(0)).zip(offsets)
      .map { case (pid, off) => (pid, off) }.toSeq
    import spark.implicits._
    val offsetDf = offsetRows.toDF("__pid", "__offset")
    val w = Window.partitionBy(col("__pid")).orderBy(keys: _*)
    parted
      .join(broadcast(offsetDf), Seq("__pid"))
      .withColumn(as, row_number().over(w).cast("long") - 1 + col("__offset"))
      .drop("__pid", "__offset")
  }
}
