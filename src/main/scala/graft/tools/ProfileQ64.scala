package graft.tools
import org.apache.spark.sql.SparkSession

/** q64 (connected-components) profiler: steady-state wall time plus
  * jobs-per-run from the status tracker, at sf0.1 on local[32].
  * Run: `sbt "runMain graft.tools.ProfileQ64"`. */
object ProfileQ64 {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.read.parquet(s"$d/documents.parquet").count()
    val tracker = spark.sparkContext.statusTracker
    def time(name: String)(f: => Unit): Unit = {
      val j0 = tracker.getJobIdsForGroup(null).length
      val t0 = System.nanoTime()
      f
      println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"(${tracker.getJobIdsForGroup(null).length - j0} jobs)")
      spark.catalog.clearCache()
    }
    val reg = graft.queries.Registry.byName _
    for (round <- 1 to 3) {
      time(s"q64 r$round") {
        reg("q64_connected_components").fn(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // phase breakdown: pairs pipeline alone vs the CC loop on
    // pre-materialized pairs
    import org.apache.spark.sql.functions._
    import graft.ops.NearDup
    val docs = spark.read.parquet(s"$d/documents.parquet")
    for (round <- 1 to 2) {
      val base = NearDup.withMutatedCopies(docs.select("doc_id", "text"),
        "doc_id", "text")
      val sigs = NearDup.minhashSignaturesFused(base, "doc_id", col("text"))
      var pairs: org.apache.spark.sql.DataFrame = null
      time(s"pairs_materialize r$round") {
        pairs = NearDup.lshCandidatePairs(sigs, "doc_id").localCheckpoint()
        println(s"  pairs=${pairs.count()}")
      }
      time(s"cc_loop_only r$round") {
        NearDup.connectedComponents(pairs)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
