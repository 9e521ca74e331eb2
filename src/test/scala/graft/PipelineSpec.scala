package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.enrich.Enricher
import graft.pipeline.CouncilPipeline
import graft.vector.HashEmbedder

object PipelineSpec {
  /** Static so executor-side closures in local mode hit the same
    * counter as the assertions. */
  val asrCalls = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** Golden pipeline tests over miniature council fixtures
  * (FIXTURES.md §A) with deterministic stub enrichment. */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def meetings = Seq(
    ("Budget Meeting", "2026-03-11 00:00:00", "https://c.example/v/m1.mp4", Some("box1")),
    ("Zoning Meeting", "2026-03-12 00:00:00", "https://c.example/v/m2.mp4", None))
    .toDF("title", "date_s", "video", "box_link")
    .withColumn("date", col("date_s").cast("timestamp")).drop("date_s")

  test("stage1: carry-forward keeps previous box_link on refresh") {
    val fresh = meetings.drop("box_link")
    val refreshed = CouncilPipeline.refreshMeetings(fresh, meetings)
    val m = refreshed.orderBy("title").collect()
    assert(m(0).getAs[String]("box_link") == "box1")
    assert(m(1).getAs[String]("box_link") == null)
  }

  test("stage1b: transcription skips inventoried videos; stub is deterministic") {
    val inventory = Seq("m1.mp4").toDF("name")
    val segs = CouncilPipeline.transcribePending(meetings, inventory,
      () => new Enricher.StubTranscriber(3))
    val byFile = segs.groupBy("file").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(byFile == Map("m2.mp4" -> 3L)) // m1 skipped (J5)
    val again = CouncilPipeline.transcribePending(meetings, inventory,
      () => new Enricher.StubTranscriber(3))
    assert(segs.collect().toSet == again.collect().toSet)
  }

  test("incremental semantics: second run performs zero enrichment calls") {
    PipelineSpec.asrCalls.set(0)
    val counting = () => new Enricher.Transcriber {
      override def transcribe(key: String, media: Array[Byte]) = {
        PipelineSpec.asrCalls.incrementAndGet()
        new Enricher.StubTranscriber(2).transcribe(key, media)
      }
    }
    val empty = Seq.empty[String].toDF("name")
    val segs1 = CouncilPipeline.transcribePending(meetings, empty, counting)
    segs1.count()
    val callsAfterFirst = PipelineSpec.asrCalls.get()
    assert(callsAfterFirst >= 2) // both videos transcribed
    // inventory now covers all outputs → rerun transcribes nothing
    val inventory = meetings.select(
      graft.expr.Functions.basename(col("video")).as("name"))
    val segs2 = CouncilPipeline.transcribePending(meetings, inventory, counting)
    assert(segs2.count() == 0)
    assert(PipelineSpec.asrCalls.get() == callsAfterFirst)
  }

  test("stage2: summarize emits rollup row (-1) plus chunk rows in order") {
    val segs = (1 to 250).map(i =>
      ("m2.mp4", i.toLong, s"word$i", 0.05)).toDF("file", "id", "text", "no_speech_prob")
    val out = CouncilPipeline.summarize(segs, () => new Enricher.StubChatModel,
      chunkSize = 100).orderBy("chunk_id").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(-1L, 0L, 1L, 2L))
    assert(out.forall(_.getString(2).nonEmpty))
    val rollup = out.head
    assert(rollup.getAs[Long]("start_id") == 1L)
    assert(rollup.getAs[Long]("end_id") == 250L)
    assert(rollup.getString(2).startsWith("reduce:"))
  }

  test("stage5: crawl dedups seen, filters short/irrelevant, projects record") {
    val rss = Seq(
      ("https://n.example/a1-council", "feed1"),
      ("https://n.example/a2-council", "feed1"),
      ("https://n.example/a3-other", "feed2"),
      (null.asInstanceOf[String], "feed2")).toDF("url", "source")
    val seenId = graft.expr.Functions.sha16(lit("https://n.example/a1-council"))
    val seen = Seq(1).toDF("x").select(seenId.as("id"))
    val out = CouncilPipeline.crawl(rss, seen,
      () => new Enricher.StubTextExtractor, keywords = Seq("council"))
    val urls = out.select("url").collect().map(_.getString(0)).toSet
    // a1 seen, a3 fails the keyword filter (stub content echoes the url
    // basename), null url dropped
    assert(urls == Set("https://n.example/a2-council"))
  }

  test("stage4+query: vectorize joins dates, builds ids, search finds self") {
    val summaries = Seq(
      ("m1.mp4", 0L, "budget discussion alpha", 1L, 100L),
      ("m1.mp4", -1L, "ROLLUP", 1L, 100L),
      ("m2.mp4", 0L, "zoning appeal beta", 1L, 90L))
      .toDF("file", "chunk_id", "summary", "start_id", "end_id")
    val embedder = new HashEmbedder(dim = 64)
    val coll = CouncilPipeline.vectorize(summaries, meetings, embedder)
    val rows = coll.orderBy("id").collect()
    assert(rows.length == 2) // rollup dropped (P11)
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("m1.mp4:1:100", "m2.mp4:1:90"))
    assert(rows.head.getMap[String, String](2)("file") == "m1.mp4")
    val hit = CouncilPipeline.searchCollection(coll, embedder,
      "budget discussion alpha", 1).head
    assert(hit.getString(0) == "m1.mp4:1:100" && hit.getDouble(1) == 1.0)
  }
}
