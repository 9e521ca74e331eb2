package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.vector.{HashEmbedder, Similarity}

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cosineSim matches manual double computation; handles zero vectors") {
    val df = Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
    val got = df.select(Similarity.cosineSim(col("a"), col("b"))).head.getDouble(0)
    val exp = (4.0 + 10.0 + 18.0) /
      (math.sqrt(1 + 4 + 9) * math.sqrt(16 + 25 + 36))
    assert(math.abs(got - exp) < 1e-15)
    val z = Seq((Array(0f, 0f), Array(1f, 1f))).toDF("a", "b")
    assert(z.select(Similarity.cosineSim(col("a"), col("b"))).head.getDouble(0) == 0.0)
  }

  test("cosineSim: orthogonal 0, identical 1") {
    val df = Seq((Array(1f, 0f), Array(0f, 1f), Array(1f, 0f))).toDF("a", "b", "c")
    val r = df.select(Similarity.cosineSim(col("a"), col("b")),
      Similarity.cosineSim(col("a"), col("c"))).head
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 1.0)
  }

  test("topK returns k rows in score-desc order, self first for member query") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 7).head.getSeq[Float](1).toArray
    val top = Similarity.topK(emb, "vec_id", "embedding", q, 5).collect()
    assert(top.length == 5)
    assert(top.head.getLong(0) == 7L && top.head.getDouble(1) == 1.0)
    assert(top.map(_.getDouble(1)).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("annTopK recall vs exact on sf0.001") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 0).head.getSeq[Float](1).toArray
    val exact = Similarity.topK(emb, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val ann = Similarity.annTopK(emb, "vec_id", "embedding", q, 10, nPlanes = 4)
      .collect().map(_.getLong(0)).toSet
    assert((exact & ann).size >= 5, s"recall too low: ${(exact & ann).size}/10")
  }

  test("filteredTopK applies the metadata predicate before scoring") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 0).head.getSeq[Float](1).toArray
    val top = Similarity.filteredTopK(emb, "vec_id", "embedding", q, 5,
      col("label") === 3)
    val labels = emb.filter(col("label") === 3)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(top.collect().forall(r => labels.contains(r.getLong(0))))
  }

  test("hash embedder: deterministic, normalized, content-sensitive") {
    val e = new HashEmbedder(dim = 64)
    val a = e.embed("the quick brown fox")
    val b = e.embed("the quick brown fox")
    val c = e.embed("something else entirely")
    assert(a.toSeq == b.toSeq)
    assert(a.toSeq != c.toSeq)
    val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6)
    assert(e.embed("").forall(_ == 0f))
  }
}
