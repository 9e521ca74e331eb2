package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generate an on-disk sf1 dataset by writing `copies`× the sf0.1
  * tables with consistent foreign-key offsets — the missing scale
  * datum the in-memory ScaleSmoke can't provide (real parquet IO,
  * real shuffle spill). Dims (region/nation) are copied as-is; every
  * fact table's keys shift together so joins stay referentially
  * intact at 10× row counts.
  *
  * `documents.text` gets every WORD prefixed with a per-copy tag
  * ("c3w1 c3w2 …"): a bijective token rename, so each copy's
  * word-shingle structure is ISOMORPHIC to the original (near-dup
  * density per copy stays at sf0.1 levels) while shingle sets are
  * DISJOINT across copies — dedup pipelines scale by ROWS, not by an
  * artificial every-doc-is-a-10-way-dup quadratic pair blowup.
  * (A separator token interleaved between words does NOT work: the
  * tag forms shingles with every word, giving all docs in a copy
  * common shingles and COLLAPSING the LSH band buckets.) Embeddings
  * get a per-copy additive perturbation for the same reason
  * (identical vectors across copies would make every top-k a 10-way
  * tie).
  *
  * `events.ts` is written back exactly as read — long nanos when the
  * source is TIMESTAMP(NANOS) (surfaced via nanosAsLong), timestamp
  * when the source is timestamp[us]; `Q.events` adapts to either
  * (it inspects the observed type), so the generated set behaves
  * identically to the source either way.
  *
  * Run: `sbt "runMain graft.tools.GenScale [copies] [outDir]"`
  * (defaults: 10 → target/sf1). Writes outside /root/repo are never
  * attempted.
  */
object GenScale {

  private def replicate(df: DataFrame, copies: Int,
      shifts: Map[String, Long], edit: (DataFrame, Int) => DataFrame =
        (d, _) => d): DataFrame =
    (0 until copies).map { k =>
      val shifted = shifts.foldLeft(df) { case (d, (c, off)) =>
        d.withColumn(c, col(c) + lit(k * off))
      }
      edit(shifted, k)
    }.reduce(_.unionByName(_))

  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outDir = args.lift(1).getOrElse("target/sf1")
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(t: String, df: DataFrame, parts: Int): Unit = {
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$outDir/$t.parquet")
      println(s"GEN $t -> $outDir/$t.parquet")
    }

    // dims: unchanged
    write("region", read("region"), 1)
    write("nation", read("nation"), 1)

    write("customer", replicate(read("customer"), copies,
      Map("c_custkey" -> 10000000L)), 4)
    write("supplier", replicate(read("supplier"), copies,
      Map("s_suppkey" -> 1000000L)), 1)
    write("part", replicate(read("part"), copies,
      Map("p_partkey" -> 10000000L)), 4)
    write("orders", replicate(read("orders"), copies,
      Map("o_orderkey" -> 100000000L, "o_custkey" -> 10000000L)), 8)
    write("lineitem", replicate(read("lineitem"), copies,
      Map("l_orderkey" -> 100000000L, "l_partkey" -> 10000000L,
        "l_suppkey" -> 1000000L)), 16)
    write("events", replicate(read("events"), copies,
      Map("event_id" -> 10000000L, "user_id" -> 10000000L)), 8)
    write("documents", replicate(read("documents"), copies,
      Map("doc_id" -> 10000000L),
      (d, k) => d.withColumn("text",
        regexp_replace(col("text"), "(\\S+)", s"c$k$$1"))), 8)
    write("embeddings", replicate(read("embeddings"), copies,
      Map("vec_id" -> 10000000L),
      (d, k) => d.withColumn("embedding",
        transform(col("embedding"), x => x + lit(k * 0.001f)))), 4)

    spark.stop()
  }
}
