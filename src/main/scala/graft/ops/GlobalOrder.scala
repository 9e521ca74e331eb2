package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Global position without a global sort bottleneck. The naive
  * `row_number() OVER (ORDER BY …)` (no partition key) collapses the
  * whole dataset into ONE task; at 100 TB that is the job. The
  * scalable construction: range-partition + sort within partitions,
  * then `zipWithIndex` — whose internal count job and map job share
  * the SAME shuffle stage (map output is reused across jobs on one
  * RDD), so partition boundaries are consistent by construction, no
  * persist needed. One of the few places an RDD hop is the right
  * tool: the per-partition offset arithmetic is genuinely imperative.
  */
object GlobalOrder {

  /** Append a 0-based global position by `keys` (which should form a
    * total order — ties across partitions are broken by partition
    * order only). */
  def withGlobalPosition(df: DataFrame, keys: Seq[Column],
      as: String = "pos"): DataFrame = {
    val spark = df.sparkSession
    val parted = df.repartitionByRange(keys: _*).sortWithinPartitions(keys: _*)
    val schema = parted.schema.add(as, LongType, nullable = false)
    val rdd = parted.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(rdd, schema)
  }
}
