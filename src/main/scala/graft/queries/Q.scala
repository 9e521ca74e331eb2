package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark plan plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL over the same parquet tables.
  * Column names are aliased identically on both sides — the driver's
  * compare sorts columns by name before hashing values.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String])

object Q {
  def apply(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(sql))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)

  /** Testdata table loader (TESTDATA.md). `events.ts` is parquet
    * TIMESTAMP(NANOS), which Spark 4 only reads via the nanosAsLong
    * legacy conf — so `ts` surfaces as long nanoseconds; derive epoch
    * millis with exact integer division (`ts div 1000000`, = DuckDB
    * `epoch_ms(ts)`). Never divide ns as double: 1.7e18 > 2^53. */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/$name.parquet")
  }

  /** events with `ts_ms` (epoch millis, exact) derived from the ns ts. */
  def events(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").withColumn("ts_ms",
      org.apache.spark.sql.functions.expr("ts div 1000000"))
}
