package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.Fingerprint

/** Pins testdata CONTENT against committed generation fingerprints.
  *
  * - `target/sf1` vs tools/sf1_fingerprint.json: sf1 is regenerated
  *   per box by GenScale; round 12's q113/q119 sf1 perf adjudication
  *   was confounded by not being able to answer "is this the same
  *   data the reference rows were measured on?" from the record.
  *   GenScale is deterministic given /root/testdata/sf0.1, so any
  *   mismatch here means either the source data or the generator
  *   changed — in which case bench_reference_sf1.json rows are
  *   cross-data and must be re-seeded.
  * - `/root/testdata/sf0.1` vs tools/sf01_fingerprint.json: the
  *   driver ships this directory and HAS re-generated it across
  *   rounds (events.ts physical type drifted at r10 and again at
  *   r13's regeneration). Without a content pin, "source changed" vs
  *   "generator changed" is indistinguishable when the sf1 pin
  *   fires — and a silent sf0.1 re-ship would cross-data EVERY
  *   committed minimum in bench_reference.json at once.
  *
  * Refresh after a deliberate change:
  *   sbt -batch "runMain graft.tools.Fingerprint <dir>" | tail -1 \
  *     > tools/<record>.json
  * (StdoutOutput unframes the program's println, but sbt's own loader
  * lines still precede it — tail -1 keeps only the JSON, the same way
  * the driver consumes the Bench line).
  */
class Sf1FingerprintSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def checkDir(dir: String, rec: String): Unit = {
    assume(new java.io.File(dir).isDirectory, s"$dir not present on this box")
    assume(new java.io.File(rec).isFile, s"$rec not committed")
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(rec)))
    Fingerprint.tables.foreach { t =>
      val exp = root.get(t)
      assert(exp != null, s"$rec has no entry for table $t")
      val (n, h) = Fingerprint.table(spark, dir, t)
      assert(n == exp.get("rows").asLong,
        s"$t: ${exp.get("rows").asLong} rows expected, got $n — $dir " +
          "is a different generation; re-seed the matching bench reference")
      assert(h == exp.get("hash").asText,
        s"$t: content hash drifted — $dir is a different generation " +
          "(source data or generator changed); per-query comparisons vs " +
          "the committed bench reference are cross-data until re-seeded")
    }
  }

  test("target/sf1 matches the committed generation fingerprint") {
    checkDir("target/sf1", "tools/sf1_fingerprint.json")
  }

  test("/root/testdata/sf0.1 matches the committed source fingerprint") {
    checkDir("/root/testdata/sf0.1", "tools/sf01_fingerprint.json")
  }
}
