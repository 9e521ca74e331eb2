package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.udf

/** V1 (SURVEY.md §2.10): text → normalized float vector behind a trait.
  * The reference's MiniLM sentence-transformer (vectorize.py:114-118)
  * is a deployment adapter; the engine core ships a deterministic
  * feature-hash embedder so the whole vector path is testable offline.
  * Real model serving plugs in as another Embedder implementation
  * executed per-partition (model handle amortized — SURVEY §4.1 O4).
  */
trait Embedder extends Serializable {
  def dim: Int
  def embed(text: String): Array[Float]
}

/** Feature-hashing embedder: token → (index, sign) from sha256 of
  * "seed:token"; L2-normalized. sha-derived (not JVM-hash), so any
  * engine reproduces the vectors bit-for-bit — index = first 16 bits
  * of the digest mod dim, sign = parity of the fifth hex nibble
  * (both slices plain-SQL decodable, see q19's oracle). */
final class HashEmbedder(val dim: Int = 384, seed: Long = 42L) extends Embedder {

  override def embed(text: String): Array[Float] = {
    val md = graft.expr.Sha.sha256() // embed() runs per row in UDFs
    val v = new Array[Float](dim)
    // UTF8String lower = the SQL lower() path — default-locale
    // String.toLowerCase would diverge on e.g. a tr_TR executor JVM
    val toks = if (text == null) Array.empty[String]
      else org.apache.spark.unsafe.types.UTF8String.fromString(text)
        .toLowerCase.trim.toString.split("\\s+")
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) {
        val d = md.digest(s"$seed:${toks(i)}"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val u16 = ((d(0) & 0xFF) << 8) | (d(1) & 0xFF)
        val idx = u16 % dim
        val sign = if (((d(2) >> 4) & 1) == 0) 1f else -1f
        v(idx) += sign
      }
      i += 1
    }
    var norm = 0.0
    var j = 0
    while (j < dim) { norm += v(j).toDouble * v(j); j += 1 }
    if (norm > 0) {
      val inv = (1.0 / math.sqrt(norm)).toFloat
      j = 0
      while (j < dim) { v(j) *= inv; j += 1 }
    }
    v
  }
}

object Embed {
  /** Attach an embedding column. The UDF closure serializes the
    * embedder to executors once per task — cheap for hash embedders;
    * heavyweight model adapters should override with a mapPartitions
    * singleton (see enrich.Enricher). */
  def withEmbedding(df: DataFrame, text: Column, embedder: Embedder,
      as: String = "embedding"): DataFrame = {
    val f = udf((s: String) => embedder.embed(s))
    df.withColumn(as, f(text))
  }
}
