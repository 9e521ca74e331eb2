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

/** Feature-hashing embedder: token → (index, sign) from a splitmix64
  * of the token hash; L2-normalized. Deterministic across JVMs
  * (String.hashCode is spec-fixed). */
final class HashEmbedder(val dim: Int = 384, seed: Long = 42L) extends Embedder {

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  override def embed(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    val toks = if (text == null) Array.empty[String]
      else text.toLowerCase.trim.split("\\s+")
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) {
        val h = splitmix64(toks(i).hashCode.toLong ^ seed)
        val idx = java.lang.Math.floorMod(h, dim.toLong).toInt
        val sign = if (((h >>> 32) & 1L) == 0L) 1f else -1f
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
