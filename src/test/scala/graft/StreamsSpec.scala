package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streams

class StreamsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def eventsDf = (0 until 500).map { i =>
    (i.toLong, i % 7L,
      java.sql.Timestamp.valueOf(s"2024-01-01 ${"%02d".format(i % 24)}:0${i % 6}:00"),
      Seq("click", "view", "purchase")(i % 3), (i % 50).toDouble)
  }.toDF("event_id", "user_id", "tstamp", "event_type", "value")

  test("hourlyTypeCounts: streaming over files == same transform in batch") {
    val dir = TestSpark.tempDir("evts")
    eventsDf.write.mode("overwrite").parquet(s"$dir/in")
    val batch = Streams.hourlyTypeCounts(eventsDf).orderBy("hour_ms", "event_type")
      .collect().toSeq
    val stream = Streams.fileStream(spark, s"$dir/in", eventsDf.schema,
      maxFilesPerTrigger = 2)
    val q = Streams.hourlyTypeCounts(stream).writeStream
      .outputMode("complete").format("memory").queryName("hourly").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("hourly").orderBy("hour_ms", "event_type")
      .collect().toSeq
    assert(streamed == batch)
  }

  test("dedupStream drops duplicate ids even with differing timestamps") {
    val dir = TestSpark.tempDir("dup")
    // re-arrivals carry a LATER timestamp (re-crawled article) — id-only
    // dedup must still drop them
    val reArrivals = eventsDf.limit(100).withColumn("tstamp",
      org.apache.spark.sql.functions.expr("tstamp + INTERVAL 1 MINUTE"))
    val dup = eventsDf.union(reArrivals)
    dup.write.mode("overwrite").parquet(s"$dir/in")
    val stream = Streams.fileStream(spark, s"$dir/in", dup.schema)
    val q = Streams.dedupStream(stream, "event_id", "tstamp").writeStream
      .outputMode("append").format("memory").queryName("dedup").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("dedup").count() == 500)
  }

  test("foreachBatch mergeSink upserts micro-batches into parquet state") {
    val dir = TestSpark.tempDir("msink")
    eventsDf.limit(50).write.mode("overwrite").parquet(s"$dir/in")
    val stream = Streams.fileStream(spark, s"$dir/in", eventsDf.schema,
      maxFilesPerTrigger = 1)
    val q = Streams.mergeSink(stream, s"$dir/state", Seq("event_id"),
      s"$dir/ckpt").start()
    q.awaitTermination()
    assert(spark.read.parquet(s"$dir/state").count() == 50)
    // second identical run: idempotent state (fresh checkpoint, same keys)
    val stream2 = Streams.fileStream(spark, s"$dir/in", eventsDf.schema)
    val q2 = Streams.mergeSink(stream2, s"$dir/state", Seq("event_id"),
      s"$dir/ckpt2").start()
    q2.awaitTermination()
    assert(spark.read.parquet(s"$dir/state").count() == 50)
  }
}
