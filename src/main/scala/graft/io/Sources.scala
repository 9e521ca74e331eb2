package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.expr.Functions

/** S2–S9 (SURVEY.md §2.1): the reference's file-shaped sources as
  * schema-explicit Spark readers. Schemas are always declared (never
  * inferred) — inference is an extra full pass and nondeterministic
  * under drift (SURVEY §1.3).
  */
object Sources {

  /** S2/S3/S4 — JSONL table (ref pd.read_json lines=True). */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** S5 — whole-file JSON array (ref articles.json, newscrawler.py:86-123). */
  def readJsonArray(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("multiLine", true).json(path)

  /** S6 — markdown + frontmatter directory (ref article_vectorize
    * .py:106-154): one row per file with parsed frontmatter keys and
    * body. `wholetext` keeps file↔row atomicity; `input_file_name`
    * carries the entity key (SURVEY §1.4). */
  def readFrontmatterMd(spark: SparkSession, dir: String,
      keys: Seq[String]): DataFrame = {
    val raw = spark.read.option("wholetext", true).text(dir + "/*.md")
      .withColumn("filename", Functions.basename(input_file_name()))
    keys.foldLeft(raw) { (df, k) =>
      df.withColumn(k, Functions.frontmatterValue(col("value"), k))
    }.withColumn("content", Functions.frontmatterBody(col("value")))
      .drop("value")
  }

  /** S3 typed — per-video transcript segments: the on-disk JSONL rows
    * carry no file key (the filename IS the key, SURVEY §1.2), so the
    * entity key is derived from `input_file_name` to satisfy the
    * `Segment` case class. */
  def readSegmentFiles(spark: SparkSession, glob: String)
      : org.apache.spark.sql.Dataset[graft.model.Schemas.Segment] = {
    import spark.implicits._
    spark.read.schema(graft.model.Schemas.segmentSchema).json(glob)
      .withColumn("file", Functions.basename(input_file_name()))
      .as[graft.model.Schemas.Segment]
  }

  /** S4 typed — .summary chunk rows, file key from the filename. */
  def readSummaryFiles(spark: SparkSession, glob: String)
      : org.apache.spark.sql.Dataset[graft.model.Schemas.SummaryChunk] = {
    import spark.implicits._
    spark.read.schema(graft.model.Schemas.summarySchema).json(glob)
      .withColumn("file", Functions.basename(input_file_name()))
      .as[graft.model.Schemas.SummaryChunk]
  }

  /** S9/J5 build side — output-file inventory via the binaryFile
    * source with content pruned (only path/length read, so listing a
    * huge output tree never touches file bytes). */
  def fileInventory(spark: SparkSession, glob: String): DataFrame =
    spark.read.format("binaryFile").load(glob)
      .select(Functions.basename(col("path")).as("name"),
        col("path"), col("length"))

  /** S1 — HTML listing-table parse (ref transcribe_council.py:28-73):
    * rows = `tr.listingRow` blocks, cells = `td.listItem`. The fetch
    * itself is a driver/ingest concern; this is the parse over a
    * wholetext-read HTML blob column. */
  def parseListingRows(html: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract_all(html,
      lit("(?s)<tr[^>]*class=\"[^\"]*listingRow[^\"]*\"[^>]*>(.*?)</tr>"), lit(1))

  def parseListItems(rowHtml: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract_all(rowHtml,
      lit("(?s)<td[^>]*class=\"[^\"]*listItem[^\"]*\"[^>]*>(.*?)</td>"), lit(1))

  /** S1 end-to-end (ref transcribe_council.py:28-73 `get_all_links`):
    * listing HTML blob → meeting rows. Row = tr.listingRow; cell 0 =
    * "Title - Date - Time" header (F1), remaining cells carry hrefs /
    * onclick links classified by F4; rows without a video are dropped
    * (P3). Pure-plan: regex explode + scalar functions, no UDFs. */
  def parseMeetingListing(html: DataFrame, htmlCol: String = "html"): DataFrame = {
    import graft.expr.Functions._
    val rows = html.select(
      explode(parseListingRows(col(htmlCol))).as("row"))
    val cells = rows
      .withColumn("cells", parseListItems(col("row")))
      .withColumn("header", regexp_replace(
        try_element_at(col("cells"), lit(1)), "<[^>]+>", ""))
      .withColumn("links", flatten(array(
        regexp_extract_all(col("row"), lit("href=\"([^\"]+)\""), lit(1)),
        regexp_extract_all(col("row"), lit("window\\.open\\('([^']+)'"), lit(1)))))
    val link = (kind: String) => fixProtocolRelative(
      try_element_at(filter(col("links"), l => linkKind(l) === kind), lit(1)))
    cells.select(
        trim(normWs(regexp_extract(col("header"), "^(.*?)\\s*-\\s*\\w+,", 1))).as("title"),
        extractMeetingDate(regexp_extract(col("header"), "-\\s*(.*)$", 1)).as("date_raw"),
        extractMeetingTime(col("header")).as("time"),
        link("video").as("video"),
        link("agenda").as("agenda"),
        link("minutes").as("minutes"))
      .filter(col("video").isNotNull)
  }
}
