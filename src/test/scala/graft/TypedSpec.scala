package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.enrich.Enricher
import graft.io.{Sinks, Sources}
import graft.model.Schemas

/** Typed Dataset path: case-class encoders over the reference's
  * on-disk formats (SURVEY §1.4 "typed pipeline rows"). */
class TypedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Dataset[Meeting] round-trips data.jsonl with explicit schema") {
    val dir = TestSpark.tempDir("typed")
    val meetings = Seq(
      Schemas.Meeting("Budget", java.sql.Timestamp.valueOf("2026-03-11 00:00:00"),
        "10:00 AM", None, "https://c/v1.mp4", Some("https://c/a1"), None, Some("box1")),
      Schemas.Meeting("Zoning", java.sql.Timestamp.valueOf("2026-03-12 00:00:00"),
        "Unknown Time", None, "https://c/v2.mp4", None, None, None))
    Sinks.writeJsonl(meetings.toDF(), s"$dir/data.jsonl")
    val back = Sources.readJsonl(spark, s"$dir/data.jsonl", Schemas.meetingSchema)
      .as[Schemas.Meeting]
    assert(back.collect().sortBy(_.title).toSeq == meetings.sortBy(_.title))
    // typed filter + map compile against fields
    assert(back.filter(_.box_link.isDefined).count() == 1)
  }

  test("Dataset[Segment] flows through typed enrichment") {
    val t = new Enricher.StubTranscriber(3)
    val segs = spark.createDataset(t.transcribe("v.mp4", "media".getBytes))
    val confident = segs.filter(_.no_speech_prob < 0.9).map(_.text)
    assert(confident.count() <= 3)
  }

  test("throttled iterator caps per-partition rate") {
    val t0 = System.nanoTime()
    val out = Enricher.throttled[Int](maxPerSecond = 50)(Iterator(1, 2, 3, 4, 5)).toList
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(out == List(1, 2, 3, 4, 5))
    // 5 items at 50/s: first free, 4 × 20 ms spacing ≈ ≥ 60 ms
    assert(elapsedMs >= 60, s"ran too fast: $elapsedMs ms")
  }
}
