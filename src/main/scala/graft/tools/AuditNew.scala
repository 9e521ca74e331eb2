package graft.tools

import org.apache.spark.sql.SparkSession
import graft.queries.Registry

/** Dev tool: print simple-mode plans of the round-7 queries for the
  * shuffle/broadcast audit (PLANS.md notes). */
object AuditNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q86_simhash_hamming", "q87_two_level_cells",
        "q88_dsir_scores", "q89_semantic_leakage")
    names.foreach { name =>
      val df = Registry.byName(name).fn(spark, "/root/testdata/sf0.001")
      df.write.format("noop").mode("overwrite").save()
      println(s"\n===== $name =====")
      println(df.queryExecution.executedPlan.toString.take(7000))
    }
    spark.stop()
  }
}
