package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.NearDup

/** Dev profiling harness (not part of the driver contract). */
object ProfileQ14 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val base = NearDup.withMutatedCopies(docs, "doc_id", "text")
    time("base count")(base.count())
    val sigs = NearDup.minhashSignatures(base, "doc_id", col("text"))
    time("sigs count")(sigs.count())
    val pairs = NearDup.lshCandidatePairs(sigs, "doc_id")
    time("pairs count")(pairs.count())
    val pairs2 = NearDup.lshCandidatePairs(
      NearDup.minhashSignatures(base, "doc_id", col("text")), "doc_id")
    time("pairs fresh count")(pairs2.count())
    spark.stop()
  }
}
