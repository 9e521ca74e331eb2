package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.FrontmatterParse

class FrontmatterSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writeMd(dir: String, name: String, body: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/$name"), body)

  test("DSv2 format(frontmatter) reads a directory, one row per file") {
    val dir = TestSpark.tempDir("fmsrc")
    writeMd(dir, "a.md", "---\nsource: feedA\ntitle: First\n---\nBody A")
    writeMd(dir, "b.md", "---\nsource: feedB\nurl: http://x\n---\nBody B\nline 2")
    writeMd(dir, "skip.txt", "not markdown")
    val df = spark.read.format("frontmatter")
      .option("keys", "source,title,url").load(dir)
    assert(df.columns.toSeq == Seq("filename", "source", "title", "url", "content"))
    val rows = df.orderBy("filename").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(1) == "feedA" && rows(0).getString(2) == "First")
    assert(rows(0).getString(3) == null) // ragged metadata → null
    assert(rows(1).getString(3) == "http://x")
    assert(rows(1).getString(4) == "Body B\nline 2")
  }

  test("DSv2 source composes with relational ops (filter/agg)") {
    val dir = TestSpark.tempDir("fmsrc2")
    (1 to 20).foreach(i =>
      writeMd(dir, s"d$i.md", s"---\nsource: feed${i % 3}\n---\ncontent $i"))
    val df = spark.read.format("frontmatter").option("keys", "source").load(dir)
    val counts = df.groupBy("source").count().orderBy("source").collect()
    assert(counts.map(_.getLong(1)).sum == 20)
    assert(counts.length == 3)
  }

  test("DSv2 source lists nested (date-partitioned) layouts recursively") {
    val dir = TestSpark.tempDir("fmnest")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/2026/01"))
    writeMd(dir, "top.md", "---\nsource: a\n---\nT")
    writeMd(s"$dir/2026/01", "deep.md", "---\nsource: b\n---\nD")
    val df = spark.read.format("frontmatter").option("keys", "source").load(dir)
    assert(df.select("filename").collect().map(_.getString(0)).sorted.toSeq
      == Seq("deep.md", "top.md"))
  }

  test("typed segment/summary readers derive the file key from the path") {
    val dir = TestSpark.tempDir("segs")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/v1.json"),
      """{"id": 0, "start": 0.0, "end": 9.5, "text": "hello", "no_speech_prob": 0.1}
        |{"id": 1, "start": 10.0, "end": 19.5, "text": "world", "no_speech_prob": 0.05}""".stripMargin)
    val segs = graft.io.Sources.readSegmentFiles(spark, s"$dir/*.json")
    val rows = segs.collect().sortBy(_.id)
    assert(rows.length == 2)
    assert(rows.forall(_.file == "v1.json"))
    assert(rows(0).text == "hello")
  }

  test("parser mirrors the reference split semantics") {
    assert(FrontmatterParse.split("no fences here") == ("", "no fences here"))
    val (fm, body) = FrontmatterParse.split("---\na: 1\nb: x:y\n---\nB")
    assert(fm == "a: 1\nb: x:y")
    assert(body == "B")
    // value keeps colons past the first (split(':', 1) semantics)
    assert(FrontmatterParse.pairs(fm) == Map("a" -> "1", "b" -> "x:y"))
    // body is stripped like the reference's parts[2].strip()
    assert(FrontmatterParse.split("---\na: 1\n---\n  B body \n")._2 == "B body")
  }

  test("parser handles CRLF documents (Windows-authored corpus)") {
    val (fm, body) = FrontmatterParse.split("---\r\na: 1\r\nb: two\r\n---\r\nBody\r\nline 2")
    assert(FrontmatterParse.pairs(fm) == Map("a" -> "1", "b" -> "two"))
    assert(body == "Body\r\nline 2")
    // the Column-expression parsers tolerate CRLF too
    import spark.implicits._
    import graft.expr.Functions._
    val doc = "---\r\nsource: feedX\r\n---\r\nbody here"
    val row = Seq(doc).toDF("d").select(
      frontmatterValue(col("d"), "source"), frontmatterBody(col("d"))).head
    assert(row.getString(0) == "feedX")
    assert(row.getString(1) == "body here")
  }

  test("DSv2 honors a user-supplied external schema (keys from its middle fields)") {
    val dir = TestSpark.tempDir("fmsrc_schema")
    writeMd(dir, "a.md", "---\nsource: feedA\ntitle: First\n---\nBody A")
    val df = spark.read
      .schema("filename STRING, source STRING, title STRING, content STRING")
      .format("frontmatter").load(dir)
    val r = df.head
    // without key derivation from the schema the reader would emit
    // 7-field default-key rows and ordinal projection would mismap
    assert(r.getString(1) == "feedA")
    assert(r.getString(2) == "First")
    assert(r.getString(3) == "Body A")
  }

  test("DSv2 rejects a mis-shaped external schema loudly (no silent ordinal mismap)") {
    val dir = TestSpark.tempDir("fmsrc_badschema")
    writeMd(dir, "a.md", "---\nsource: feedA\n---\nBody A")
    // first/last fields must be filename/content when keys are derived
    // from the schema — a renamed layout would mismap by position
    val renamed = intercept[IllegalArgumentException] {
      spark.read.schema("path STRING, source STRING, body STRING")
        .format("frontmatter").load(dir).collect()
    }
    assert(renamed.getMessage.contains("filename"), renamed.getMessage)
    // with an explicit keys option the names are free but the ARITY
    // must match filename + keys + content
    val arity = intercept[IllegalArgumentException] {
      spark.read.schema("filename STRING, source STRING, content STRING")
        .option("keys", "source,title")
        .format("frontmatter").load(dir).collect()
    }
    assert(arity.getMessage.contains("fields"), arity.getMessage)
  }

  test("DSv2 listing skips hidden/temporary paths") {
    val dir = TestSpark.tempDir("fmhid")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/_temporary/0"))
    writeMd(dir, "keep.md", "---\nsource: a\n---\nK")
    writeMd(s"$dir/_temporary/0", "partial.md", "---\nsource: crash\n---\nP")
    writeMd(dir, ".hidden.md", "---\nsource: h\n---\nH")
    val df = spark.read.format("frontmatter").option("keys", "source").load(dir)
    assert(df.select("filename").collect().map(_.getString(0)).toSeq == Seq("keep.md"))
  }

  test("DSv2 listing: dotted/underscore ANCESTOR dirs don't hide the corpus") {
    // the hidden() check must only apply to segments below the load
    // root — a corpus under e.g. ~/.cache/corpus must still read (the
    // unqualified-path stripPrefix bug made this silently return 0 rows)
    val base = TestSpark.tempDir("fmanc")
    val root = s"$base/.cache/_staging/corpus"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    writeMd(root, "doc.md", "---\nsource: a\n---\nD")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$root/_temporary"))
    writeMd(s"$root/_temporary", "junk.md", "---\nsource: t\n---\nJ")
    val df = spark.read.format("frontmatter").option("keys", "source").load(root)
    assert(df.select("filename").collect().map(_.getString(0)).toSeq == Seq("doc.md"))
  }

  test("DSv2 multi-path load reads all directories") {
    val d1 = TestSpark.tempDir("fmp1")
    val d2 = TestSpark.tempDir("fmp2")
    writeMd(d1, "a.md", "---\nsource: x\n---\nA")
    writeMd(d2, "b.md", "---\nsource: y\n---\nB")
    val df = spark.read.format("frontmatter").option("keys", "source").load(d1, d2)
    assert(df.select("filename").collect().map(_.getString(0)).sorted.toSeq
      == Seq("a.md", "b.md"))
  }
}
