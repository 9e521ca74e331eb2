package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in graft.queries.* (one module per operator family);
  * this object just assembles the maps.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The chunk-summarize shape (W1+A1+A4) — the reference's load-bearing
    * windowed computation (summarize.py:110-156). */
  def entry(spark: SparkSession): DataFrame =
    Registry.byName("q09_chunk_summarize").fn(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.sql.map(q.name -> _)).toMap
}
