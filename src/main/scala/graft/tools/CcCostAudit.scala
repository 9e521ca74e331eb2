package graft.tools

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerJobEnd, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Per-iteration cost accounting for the fixed-point family
  * (q64/q66/q83/q94 ≈ 18% of the sf0.1 bench): one line per Spark JOB
  * with its stage/task counts and shuffle read/write volumes,
  * interleaved with the loops' own `GRAFT_CC_DEBUG`/iteration prints.
  * Because the CC loop schedules exactly ONE job per iteration (the
  * delta checkpoint), job rows ARE iteration rows there; PageRank's
  * per-round jobs group the same way. Findings land in PLANS.md so a
  * future regression is diagnosable from the record (which iteration
  * count grew? which round's shuffle ballooned?) without re-profiling.
  *
  * Run: `GRAFT_CC_DEBUG=1 sbt "runMain graft.tools.CcCostAudit [qname...]"`
  * Dev tool — not part of the shipped library surface.
  */
object CcCostAudit {

  private final class Acc {
    var stages = 0
    var tasks = 0
    var shufRead = 0L
    var shufWrite = 0L
    var records = 0L
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, appName = "graft-cc-audit")
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // stageId → owning jobId (from job start), jobId → accumulated
    // metrics (from stage completion); print + drop at job end
    val stageJob = new ConcurrentHashMap[Int, Int]()
    val jobAcc = new ConcurrentHashMap[Int, Acc]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobAcc.put(j.jobId, new Acc)
        j.stageInfos.foreach(si => stageJob.put(si.stageId, j.jobId))
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val jid = stageJob.getOrDefault(s.stageInfo.stageId, -1)
        val acc = jobAcc.get(jid)
        if (acc != null) acc.synchronized {
          acc.stages += 1
          acc.tasks += s.stageInfo.numTasks
          val m = s.stageInfo.taskMetrics
          if (m != null) {
            acc.shufRead += m.shuffleReadMetrics.totalBytesRead
            acc.shufWrite += m.shuffleWriteMetrics.bytesWritten
            acc.records += m.shuffleWriteMetrics.recordsWritten
          }
        }
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val acc = jobAcc.remove(j.jobId)
        if (acc != null)
          println(f"  JOB ${j.jobId}%4d stages=${acc.stages} " +
            f"tasks=${acc.tasks} shufRead=${acc.shufRead / 1024.0 / 1024}%.2fMB " +
            f"shufWrite=${acc.shufWrite / 1024.0 / 1024}%.2fMB " +
            f"shufRecords=${acc.records}")
      }
    })

    spark.read.parquet(s"$d/documents.parquet").count() // warmup

    val wanted =
      if (args.nonEmpty) args.toSeq
      else Seq("q64_connected_components", "q66_transitive_keep_best",
        "q83_pagerank", "q94_label_store")
    for (name <- wanted) {
      println(s"=== $name ===")
      val t0 = System.nanoTime()
      graft.queries.Registry.byName(name).fn(spark, d)
        .write.format("noop").mode("overwrite").save()
      println(f"=== $name total ${(System.nanoTime() - t0) / 1e9}%.2f s ===")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
