package graft.tools

import org.apache.spark.sql.SparkSession

/** Content fingerprint of a testdata directory: per table, the row
  * count plus an ORDER-INSENSITIVE content hash — the decimal sum of
  * per-row xxhash64 over every column. Sum (not xor) keeps duplicate
  * rows visible; decimal(38,0) accumulation cannot overflow under ANSI
  * at any realistic row count (|sum| ≤ n·2^63 < 10^38 up to ~10^18
  * rows); parquet row/file order doesn't matter, so a repartitioned
  * rewrite of identical content fingerprints identically.
  *
  * Why: `target/sf1` is REGENERATED per box (GenScale), and round 12's
  * q113/q119 sf1 perf flags were confounded by "is this even the same
  * data the reference rows were measured on?". GenScale is
  * deterministic given /root/testdata/sf0.1, so the fingerprint pins
  * the generation: Sf1FingerprintSpec compares against the committed
  * values and names the drift if a regeneration ever diverges.
  *
  * Run: `sbt "runMain graft.tools.Fingerprint [dir]"` (default
  * target/sf1) — prints one JSON line.
  */
object Fingerprint {

  val tables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** (rows, decimal string of sum(xxhash64(all columns + null bitmap))).
    * Spark's hash expressions SKIP null inputs (the seed passes through
    * unchanged), so a value shifting between nullable columns around a
    * null — ('a', null) becoming (null, 'a') — would hash identically.
    * Appending the per-row null bitmap as an explicit array column
    * restores sensitivity to exactly that drift. */
  def table(spark: SparkSession, dir: String, name: String): (Long, String) = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val nullBitmap = array(df.columns.map(c => col(c).isNull): _*)
    val row = df.select(
      count(lit(1)).as("n"),
      sum(xxhash64(df.columns.map(col) :+ nullBitmap: _*)
        .cast("decimal(38,0)")).as("h")).head()
    val h = Option(row.getDecimal(1)).map(_.toBigInteger.toString).getOrElse("0")
    (row.getLong(0), h)
  }

  def all(spark: SparkSession, dir: String): Seq[(String, Long, String)] =
    tables.map { t => val (n, h) = table(spark, dir, t); (t, n, h) }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf1")
    // SPARK_GRAFT_CPUS semantics match Bench exactly: an explicit
    // value is honored verbatim (malformed throws, oversubscription
    // warns) so the env var means ONE thing across both mains. Only
    // the default differs — host cores, not the 32-core bench
    // contract — because results are content hashes (order-
    // insensitive sums): parallelism affects runtime only.
    val hostCores = Runtime.getRuntime.availableProcessors
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(hostCores)
    if (cpus > hostCores)
      System.err.println(s"FINGERPRINT: local[$cpus] oversubscribes this host " +
        s"($hostCores cores) — hashes are unaffected, runtime only")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val parts = all(spark, dir).map { case (t, n, h) =>
      s""""$t":{"rows":$n,"hash":"$h"}"""
    }
    spark.stop()
    println(s"""{"dir":"$dir",${parts.mkString(",")}}""")
  }
}
