package graft.tools
import org.apache.spark.sql.SparkSession
object ProfileQ13 {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    spark.read.parquet(s"$d/lineitem.parquet").count()
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    val reg = graft.queries.Registry.byName _
    for (round <- 1 to 3) {
      time(s"q13 r$round") { reg("q13_minhash_sig").fn(spark, d).write.format("noop").mode("overwrite").save() }
      time(s"q14 r$round") { reg("q14_lsh_neardup_pairs").fn(spark, d).write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
