package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Registry

/** Every registered query runs at sf0.001 and yields rows; names are
  * unique and every oracle entry points at a real query. */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("registry is consistent") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  Registry.all.foreach { q =>
    test(s"${q.name} runs and returns rows") {
      assert(q.fn(spark, sf).count() > 0)
    }
  }
}
