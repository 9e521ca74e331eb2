package graft.io

import java.util
import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 for the reference's frontmatter-markdown corpus
  * (SURVEY §2.1 S6 "custom TableProvider in production"):
  *
  * {{{
  * spark.read.format("frontmatter")
  *   .option("keys", "source,title,url")   // frontmatter keys → columns
  *   .load("/path/to/articles")
  * }}}
  *
  * Columns: `filename`, one string column per requested key (null when
  * absent — the reference's ragged metadata, §1.2), and `content`
  * (body after the closing fence). One InputPartition per file: each
  * document is atomic (file = row), reads happen on executors via the
  * serialized Hadoop conf, and the driver only lists the directory —
  * the same planning shape Spark's own file sources use, so a 100 TB
  * corpus fans out across the cluster.
  */
class FrontmatterSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "frontmatter"

  private def keysOf(options: CaseInsensitiveStringMap): Seq[String] =
    Option(options.get("keys")).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("source", "title", "url", "published", "saved_at"))

  private def schemaFor(keys: Seq[String]): StructType =
    StructType(
      StructField("filename", StringType) +:
        keys.map(k => StructField(k, StringType)) :+
        StructField("content", StringType))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    schemaFor(keysOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    // supportsExternalMetadata contract: a user-supplied schema (via
    // .schema(...)) defines the row layout. Its middle fields ARE the
    // frontmatter keys — deriving keys from the option default here
    // would emit rows in a different column order and Spark's ordinal
    // projection would silently mismap every column. An explicit
    // `keys` option still wins (the schema may rename columns).
    val keys =
      if (opts.containsKey("keys") || schema == null || schema.fields.length < 2)
        keysOf(opts)
      else schema.fieldNames.toSeq.drop(1).dropRight(1)
    // The positional contract above (field 0 = filename, middle =
    // frontmatter keys, last = content) is an ASSUMPTION about a
    // user-supplied schema — a schema shaped any other way would
    // silently mismap every column through the ordinal projection.
    // Validate it loudly instead.
    if (schema != null) {
      require(schema.fields.length == keys.size + 2,
        s"frontmatter: external schema has ${schema.fields.length} fields " +
          s"but the layout is filename + ${keys.size} key(s) + content = " +
          s"${keys.size + 2} (keys: ${keys.mkString(", ")}). Pass the " +
          "frontmatter keys via option(\"keys\", ...) to match.")
      if (!opts.containsKey("keys")) {
        require(schema.fields.head.name.equalsIgnoreCase("filename") &&
          schema.fields.last.name.equalsIgnoreCase("content"),
          s"frontmatter: external schema must start with 'filename' and " +
            s"end with 'content' (got '${schema.fields.head.name}' … " +
            s"'${schema.fields.last.name}') — the middle fields are read " +
            "as frontmatter keys BY POSITION. To rename columns, pass " +
            "option(\"keys\", ...) with the real key names.")
      }
    }
    new FrontmatterTable(schema, keys, FrontmatterSource.pathsOf(opts))
  }

  override def supportsExternalMetadata(): Boolean = true
}

object FrontmatterSource {
  /** `load(p)` arrives as option "path"; `load(p1, p2, …)` arrives as
    * option "paths" (a JSON array). Honor both. */
  private[io] def pathsOf(options: CaseInsensitiveStringMap): Seq[String] = {
    val single = Option(options.get("path")).toSeq
    val multi = Option(options.get("paths")).toSeq.flatMap { js =>
      import org.json4s._
      org.json4s.jackson.JsonMethods.parse(js) match {
        case JArray(vs) => vs.collect { case JString(s) => s }
        case _ => Seq.empty
      }
    }
    single ++ multi
  }
}

private[io] class FrontmatterTable(schema: StructType, keys: Seq[String],
    paths: Seq[String]) extends Table with SupportsRead {

  override def name(): String = s"frontmatter(${paths.mkString(",")})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new FrontmatterScan(schema, keys,
      paths ++ FrontmatterSource.pathsOf(options))
}

private[io] class FrontmatterScan(schema: StructType, keys: Seq[String],
    paths: Seq[String]) extends Scan with Batch {

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    require(paths.nonEmpty,
      "frontmatter source needs a path: spark.read.format(\"frontmatter\").load(dir)")
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    paths.distinct.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      // hidden/temporary paths ('_'/'.' prefixed, e.g. _temporary from
      // a crashed writer) are excluded at every level BELOW the load
      // root, matching Spark's own file-source listing convention.
      // Both sides are fs-qualified before stripping: listFiles returns
      // qualified URIs (file:/...) while the user path is often bare, so
      // a raw stripPrefix would no-op and dot/underscore ANCESTORS of
      // the root (e.g. /home/u/.cache/corpus) would hide everything.
      val qualifiedRoot = fs.makeQualified(path)
      def hidden(p: Path): Boolean = {
        val rel = fs.makeQualified(p).toString
          .stripPrefix(qualifiedRoot.toString)
        rel.split("/").exists(seg =>
          seg.startsWith("_") || seg.startsWith("."))
      }
      val statuses: Seq[FileStatus] =
        if (fs.getFileStatus(path).isDirectory) {
          // recursive: corpora are commonly laid out date-partitioned
          val it = fs.listFiles(path, true)
          val buf = scala.collection.mutable.ArrayBuffer.empty[FileStatus]
          while (it.hasNext) {
            val s = it.next()
            if (s.getPath.getName.endsWith(".md") && !hidden(s.getPath)) buf += s
          }
          buf.toSeq
        } else Seq(fs.getFileStatus(path))
      statuses.map(s => FrontmatterPartition(s.getPath.toString): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    new FrontmatterReaderFactory(keys, conf)
  }
}

private[io] case class FrontmatterPartition(file: String) extends InputPartition

private[io] class FrontmatterReaderFactory(keys: Seq[String],
    conf: SerializableConfiguration) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[FrontmatterPartition].file
    new PartitionReader[InternalRow] {
      private var done = false
      private var row: InternalRow = _

      override def next(): Boolean = {
        if (done) return false
        val path = new Path(file)
        val fs = path.getFileSystem(conf.value)
        val in = fs.open(path)
        val text = try {
          new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        } finally in.close()
        val (fm, body) = FrontmatterParse.split(text)
        val kv = FrontmatterParse.pairs(fm)
        val vals: Seq[UTF8String] =
          UTF8String.fromString(path.getName) +:
            keys.map(k => kv.get(k).map(UTF8String.fromString).orNull) :+
            UTF8String.fromString(body)
        row = InternalRow.fromSeq(vals)
        done = true
        true
      }

      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}

/** Plain-Scala frontmatter parser mirroring the reference's
  * `split('---', 2)` + per-line `split(':', 1)` loop
  * (article_vectorize.py:84-103). */
private[graft] object FrontmatterParse {

  /** → (frontmatter block, body). No fence → ("", whole text). Body is
    * trimmed like the reference's `parts[2].strip()`. */
  def split(text: String): (String, String) = {
    // accept CRLF fences: a Windows-authored corpus must parse, not
    // silently come back as all-null keys with fenced content
    val fenceLen =
      if (text.startsWith("---\n")) 4
      else if (text.startsWith("---\r\n")) 5
      else return ("", text)
    val rest = text.substring(fenceLen)
    val end = rest.indexOf("\n---")
    if (end < 0) return ("", text)
    // a CR before the closing fence belongs to the fence, not the fm
    val fm = rest.substring(0, end).stripSuffix("\r")
    (fm, rest.substring(end + 4).trim)
  }

  def pairs(fm: String): Map[String, String] =
    fm.split("\r?\n").iterator.flatMap { line =>
      val i = line.indexOf(':')
      if (i <= 0) None
      else Some(line.substring(0, i).trim -> line.substring(i + 1).trim)
    }.toMap
}
