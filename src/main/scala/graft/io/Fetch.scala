package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.enrich.Enricher

/** S10 (SURVEY.md §2.1): HTTP blob download as a side-effecting
  * enrichment, not a relational scan — the reference streams each
  * video to disk in 8 KiB chunks with a 2 s politeness sleep
  * (transcribe_council.py:76-83 `dl_video`).
  *
  * Spark shape: `mapPartitions` with a per-partition fetcher instance
  * (connection pool amortized), a partition-local token-bucket
  * throttle (global rate = partitions × maxPerSecond — size the fetch
  * stage's partitioning to the politeness budget, typically
  * `repartition(nWorkers)` on the url list), and per-row dead-letter
  * capture so one dead URL can't fail a million-row fetch stage. The
  * payload lands as a `binary` column feeding the multimodal pipeline
  * (Multimodal.withDecodedMeta) or a per-entity sink (Sinks
  * .writePerEntity) — the distributed analog of the reference's
  * one-file-per-video download loop.
  */
object Fetch {

  /** Transport boundary. Real deployments wrap an HTTP client doing a
    * streamed GET (chunked read, bounded buffers — never
    * whole-response-in-one-allocation for multi-GB media). */
  trait BlobFetcher extends Serializable {
    def fetch(url: String): Array[Byte]
  }

  /** Deterministic stub transport: payload bytes derived from a
    * sha256 stream over the url — stable across JVMs, no network.
    * Urls containing "unreachable" throw, exercising dead-letter. */
  final class StubBlobFetcher(blobBytes: Int = 256) extends BlobFetcher {
    override def fetch(url: String): Array[Byte] = {
      require(url != null && !url.contains("unreachable"),
        s"connect failed: $url")
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val out = new Array[Byte](blobBytes)
      var filled = 0
      var ctr = 0
      while (filled < blobBytes) {
        val block = md.digest(s"$url#$ctr".getBytes("UTF-8"))
        val n = math.min(block.length, blobBytes - filled)
        System.arraycopy(block, 0, out, filled, n)
        filled += n
        ctr += 1
      }
      out
    }
  }

  /** Fetch each url into a binary `payload` column with dead-letter
    * capture: output schema `(url, payload, fetch_error)` — exactly one
    * of payload/fetch_error is null per row. `maxPerSecond` throttles
    * per partition (politeness; ref sleep(2) ≈ 0.5/s per worker). */
  def fetchBlobs(df: DataFrame, urlCol: Column,
      fetcher: () => BlobFetcher,
      maxPerSecond: Option[Double] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val urls = df.select(urlCol.cast("string")).as[String]
    val fetched = urls.mapPartitions { it0 =>
      val it = maxPerSecond
        .map(r => Enricher.throttled[String](r)(it0))
        .getOrElse(it0)
      val f = fetcher()
      it.map { url =>
        try (url, f.fetch(url), null: String)
        catch {
          case scala.util.control.NonFatal(e) =>
            (url, null: Array[Byte], s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    }
    fetched.toDF("url", "payload", "fetch_error")
  }
}
