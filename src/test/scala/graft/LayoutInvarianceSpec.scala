package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Registry

/** Order-sensitive queries must produce identical results whether a
  * table arrives as one parquet file or many (a cluster never reads
  * one file) — this is exactly where pandas-style implicit-order
  * assumptions would break (SURVEY §7.5.1).
  */
class LayoutInvarianceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val multiFileDir: String = {
    val dir = TestSpark.tempDir("layout")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // same data, shuffled into 8 files per table
    Seq("events", "documents", "embeddings", "lineitem", "orders",
      "customer", "nation", "region", "supplier", "part").foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet")
        .repartition(8)
        .write.parquet(s"$dir/$t.parquet")
    }
    dir
  }

  Seq("q09_chunk_summarize", "q10_rollup_concat", "q11_dedup_first",
    "q29_first_per_group", "q36_sessionize", "q45_window_family",
    "q51_global_position", "q47_asof_join", "q60_pack_sequences").foreach { name =>
    test(s"$name is invariant to input file layout") {
      val single = Registry.byName(name).fn(spark, sf).collect().toSeq
      val multi = Registry.byName(name).fn(spark, multiFileDir).collect().toSeq
      assert(single == multi)
    }
  }
}
