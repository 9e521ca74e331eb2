package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._

/** Scale-adaptive parallelism repair for CPU-dense map kernels over
  * unsplittable inputs — optimization guide §2.5 ("input skew: one
  * huge unsplittable file ... repartition immediately after the
  * read").
  *
  * Parquet scans parallelize at ROW-GROUP granularity. The test
  * fixtures (and any small-file ingest — one file per crawl tick is
  * the reference's own layout) ship one row group per file, so a
  * sha256 / regex / tokenize kernel downstream of such a scan runs on
  * ONE task no matter how many cores the session has: Spark still
  * plans several byte-range splits, but every split except the one
  * holding the row-group midpoint yields zero rows. `widen` inserts a
  * round-robin exchange ONLY when the scan's planned partition count
  * sits below half the session's default parallelism, so:
  *  - at production scale (thousands of row groups) the gate
  *    short-circuits and NO exchange is added — this never shuffles a
  *    corpus-sized payload that was already parallel;
  *  - a genuinely unsplittable big input (the gzip case) gets the
  *    guide's documented remedy.
  *
  * The partition probe (`df.rdd.getNumPartitions`) is job-free only
  * when the plan has no exchange below it, so `widen` first walks the
  * logical plan and passes through untouched anything that is not a
  * scan/checkpoint-rooted chain of projections, filters and unions —
  * for those frames a probe could eagerly execute AQE query stages
  * that the real action would then recompute.
  */
object Par {

  private def scanRooted(plan: LogicalPlan): Boolean = plan match {
    case _: LeafNode => true // file relation, LogicalRDD, LocalRelation
    case p: Project => scanRooted(p.child)
    case f: Filter => scanRooted(f.child)
    case u: Union => u.children.forall(scanRooted)
    case s: SubqueryAlias => scanRooted(s.child)
    case _ => false
  }

  /** Round-robin repartition to the session's parallelism iff the
    * input is scan-rooted and plans fewer than half that many
    * partitions. Identity otherwise. */
  def widen(df: DataFrame): DataFrame = {
    if (!scanRooted(df.queryExecution.analyzed)) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      // job-free: no exchange below, so partitions = file splits
      val planned = df.rdd.getNumPartitions
      if (planned * 2 < target) df.repartition(target) else df
    }
  }
}
