package graft.tools
import org.apache.spark.sql.SparkSession

/** Generic per-query profiler: 3 steady-state rounds per named query
  * (noop sink, cache cleared between), at SPARK_GRAFT_SF_DIR on
  * local[32]. `sbt "runMain graft.tools.ProfileQueries q100_novelty"`.
  * The per-round jobs count comes from the status tracker — a jump in
  * jobs (not time) is the tell for a plan change vs machine noise. */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.read.parquet(s"$d/documents.parquet").count() // JVM warmup
    val tracker = spark.sparkContext.statusTracker
    args.foreach { name =>
      for (round <- 1 to 3) {
        val j0 = tracker.getJobIdsForGroup(null).length
        val t0 = System.nanoTime()
        graft.queries.Registry.byName(name).fn(spark, d)
          .write.format("noop").mode("overwrite").save()
        println(f"PROF $name r$round ${(System.nanoTime() - t0) / 1e9}%.2f s " +
          s"(${tracker.getJobIdsForGroup(null).length - j0} jobs)")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
