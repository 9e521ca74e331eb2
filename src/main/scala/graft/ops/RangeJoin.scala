package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-tolerance range join: pairs (l, r) sharing a key with
  * |l.ts − r.ts| ≤ tolerance. Written naively this is an inequality
  * theta join — broadcast nested loop, O(|L|·|R|) per key. The scale
  * formulation bands both sides into tolerance-width buckets and
  * replicates the right side into its adjacent bands: the join becomes
  * a single equi-join on (key, band) — shuffle-partitioned, AQE/skew
  * machinery applies — followed by the exact |Δt| filter. Each true
  * pair matches on exactly one band equality, so no dedup is needed.
  */
object RangeJoin {

  /** `leftTs`/`rightTs` must be integral (epoch ms/us). Output carries
    * all left columns plus `right`'s (caller renames collisions). */
  def withinTolerance(left: DataFrame, right: DataFrame, key: Seq[String],
      leftTs: String, rightTs: String, tolerance: Long): DataFrame = {
    require(tolerance > 0)
    val lb = left.withColumn("__band", expr(s"$leftTs div $tolerance"))
    val rBand = expr(s"$rightTs div $tolerance")
    val rb = right.withColumn("__band",
      explode(array(rBand - 1, rBand, rBand + 1)))
    lb.join(rb, key :+ "__band")
      .filter(abs(col(leftTs) - col(rightTs)) <= tolerance)
      .drop("__band")
  }
}
