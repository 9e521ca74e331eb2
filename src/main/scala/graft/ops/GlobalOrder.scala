package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global position without a global sort bottleneck. The naive
  * `row_number() OVER (ORDER BY …)` (no partition key) collapses the
  * whole dataset into ONE task; at 100 TB that is the job. The
  * scalable construction: range-partition on the sort keys, number
  * within partitions, and offset by the (tiny, driver-collected)
  * per-partition counts — two extra passes over metadata, zero
  * single-task stages. This is what P11's "drop first row" and F19's
  * positional ids need at scale (SURVEY §7.5.1).
  */
object GlobalOrder {

  /** Append a 0-based global position by `keys` (which should form a
    * total order — ties across partitions are broken by partition
    * order only). */
  def withGlobalPosition(df: DataFrame, keys: Seq[Column],
      as: String = "pos"): DataFrame = {
    val parted = df.repartitionByRange(keys: _*)
      .withColumn("__pid", spark_partition_id())
    // per-partition counts: numPartitions rows — driver-safe
    val counts = parted.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .orderBy(col("__pid")).collect()
    val offsets = counts.scanLeft(0L)((acc, r) => acc + r.getLong(1))
    val offsetMap = counts.map(_.getInt(0)).zip(offsets).toMap
    val offsetCol = counts.map(_.getInt(0)).foldLeft(lit(0L)) { (acc, pid) =>
      when(col("__pid") === pid, lit(offsetMap(pid))).otherwise(acc)
    }
    val w = Window.partitionBy(col("__pid")).orderBy(keys: _*)
    parted
      .withColumn(as, row_number().over(w).cast("long") - 1 + offsetCol)
      .drop("__pid")
  }
}
