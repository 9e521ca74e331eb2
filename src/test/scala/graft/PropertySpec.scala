package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.ops.{NearDup, Packing}

/** Randomized invariants for the operators whose correctness rests on
  * order/partitioning discipline — the places example tests can miss
  * an interleaving. Plain scalacheck (no scalatestplus bridge in the
  * offline cache), fixed sample counts, loud failures.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(prop: Prop, n: Int = 20): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(r.passed, r.status.toString)
  }

  test("property: packByTokenBudget == sequential prefix sum, any partitioning") {
    val gen = for {
      n <- Gen.choose(1, 120)
      toks <- Gen.listOfN(n, Gen.choose(0L, 50L))
      parts <- Gen.choose(1, 12)
      budget <- Gen.choose(1L, 200L)
    } yield (toks, parts, budget)
    check(Prop.forAll(gen) { case (toks, parts, budget) =>
      val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "n_tokens").repartition(parts)
      val got = Packing.packByTokenBudget(df, Seq(col("id")), col("n_tokens"), budget)
        .orderBy("id").collect()
        .map(r => (r.getAs[Long]("prefix_tokens"), r.getAs[Long]("pack_id")))
      var cum = 0L
      val want = toks.map { t => val p = cum; cum += t; (p, p / budget) }
      got.toSeq == want
    }, n = 15)
  }

  test("property: fused MinHashSig == explode+agg on random token soups") {
    val word = Gen.oneOf("alpha", "beta", "Gamma", "δelta", "x1", "", " ")
    val gen = for {
      n <- Gen.choose(0, 25)
      ws <- Gen.listOfN(n, word)
    } yield ws.mkString(" ")
    check(Prop.forAll(Gen.listOfN(12, gen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val a = NearDup.minhashSignatures(df, "doc_id", col("text"))
        .orderBy("doc_id").collect().toSeq
      val b = NearDup.minhashSignaturesFused(df, "doc_id", col("text"))
        .orderBy("doc_id").collect().toSeq
      a == b
    }, n = 10)
  }

  test("property: dropNearDuplicates keeps min id of every dup cluster") {
    val gen = for {
      n <- Gen.choose(2, 30)
      pairs <- Gen.listOf(Gen.zip(Gen.choose(0L, 29L), Gen.choose(0L, 29L)))
    } yield (n, pairs.filter { case (a, b) => a < b })
    check(Prop.forAll(gen) { case (n, rawPairs) =>
      val ids = (0L until n.toLong)
      val pairs = rawPairs.filter { case (a, b) => a < n && b < n }
      val df = ids.map(i => (i, s"doc$i")).toDF("doc_id", "text")
      val pdf = if (pairs.isEmpty)
        Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
      else pairs.toDF("doc_a", "doc_b")
      val kept = NearDup.dropNearDuplicates(df, "doc_id", pdf)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val dropped = pairs.map(_._2).toSet
      kept == ids.toSet -- dropped
    }, n = 15)
  }
}
