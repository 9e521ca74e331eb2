package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.Fingerprint

/** Pins the CONTENT of target/sf1 against the committed generation
  * fingerprint (tools/sf1_fingerprint.json). target/sf1 is regenerated
  * per box by GenScale; round 12's q113/q119 sf1 perf adjudication was
  * confounded by not being able to answer "is this the same data the
  * reference rows were measured on?" from the record. GenScale is
  * deterministic given /root/testdata/sf0.1, so any mismatch here means
  * either the source data or the generator changed — in which case
  * bench_reference_sf1.json rows are cross-data and must be re-seeded.
  *
  * Refresh after a deliberate change:
  *   sbt -batch "runMain graft.tools.Fingerprint" | tail -1 \
  *     > tools/sf1_fingerprint.json
  * (StdoutOutput unframes the program's println, but sbt's own loader
  * lines still precede it — tail -1 keeps only the JSON, the same way
  * the driver consumes the Bench line).
  */
class Sf1FingerprintSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "target/sf1"
  private val rec = "tools/sf1_fingerprint.json"

  test("target/sf1 matches the committed generation fingerprint") {
    assume(new java.io.File(dir).isDirectory, s"$dir not generated on this box")
    assume(new java.io.File(rec).isFile, s"$rec not committed")
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(rec)))
    Fingerprint.tables.foreach { t =>
      val exp = root.get(t)
      assert(exp != null, s"$rec has no entry for table $t")
      val (n, h) = Fingerprint.table(spark, dir, t)
      assert(n == exp.get("rows").asLong,
        s"$t: ${exp.get("rows").asLong} rows expected, got $n — target/sf1 " +
          "is a different generation; re-seed bench_reference_sf1.json")
      assert(h == exp.get("hash").asText,
        s"$t: content hash drifted — target/sf1 is a different generation " +
          "(source data or GenScale changed); sf1 per-query comparisons vs " +
          "bench_reference_sf1.json are cross-data until re-seeded")
    }
  }
}
