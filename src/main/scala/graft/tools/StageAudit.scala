package graft.tools
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev-loop per-query cost attribution (optimization guide §1/§7):
  * runs named queries steady-state (1 warmup + 2 timed, noop sink,
  * caches cleared) and prints, for the LAST timed pass, every Spark
  * job with wall, stage count, task count, and shuffle read/write
  * bytes, plus a per-query roll-up. The question it answers is the
  * guide's first one: is a row's time going to exchanges, to many
  * small jobs (driver latency), or to executor compute?
  *
  * `sbt "runMain graft.tools.StageAudit q34_topk_revenue q83_pagerank"`
  */
object StageAudit {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus, appName = "graft-stage-audit")
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    final case class JobRec(id: Int, var start: Long = 0L, var end: Long = 0L,
      var stages: Int = 0, var tasks: Int = 0,
      var shufRead: Long = 0L, var shufWrite: Long = 0L,
      var inBytes: Long = 0L, var runMs: Long = 0L, var cpuMs: Long = 0L,
      var desc: String = "")
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stageToJob = mutable.Map.empty[Int, Int]
    var collecting = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = synchronized {
        if (collecting) {
          val r = JobRec(j.jobId, start = j.time)
          r.stages = j.stageInfos.size
          r.tasks = j.stageInfos.map(_.numTasks).sum
          r.desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
          jobs(j.jobId) = r
          j.stageIds.foreach(sid => stageToJob(sid) = j.jobId)
        }
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = synchronized {
        jobs.get(j.jobId).foreach(_.end = j.time)
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        synchronized {
          for (jid <- stageToJob.get(s.stageInfo.stageId);
               r <- jobs.get(jid)) {
            val m = s.stageInfo.taskMetrics
            if (m != null) {
              r.shufRead += m.shuffleReadMetrics.totalBytesRead
              r.shufWrite += m.shuffleWriteMetrics.bytesWritten
              r.inBytes += m.inputMetrics.bytesRead
              r.runMs += m.executorRunTime
              r.cpuMs += m.executorCpuTime / 1000000L
            }
            if (r.desc.length < 200)
              r.desc += s"[${s.stageInfo.name.take(60)}] "
          }
        }
    })

    spark.read.parquet(s"$d/documents.parquet").count() // warmup
    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      graft.queries.Registry.byName(name).fn(spark, d)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      graft.ops.Pinned.releaseAll()
      dt
    }
    // --all: one summary line per registered query (no per-job detail)
    // — the whole-suite structural map (jobs/tasks/cpu), noise-robust.
    val (names, detail) =
      if (args.contains("--all")) (graft.queries.Registry.all.map(_.name), false)
      else (args.toSeq, true)
    names.foreach { name =>
      runOnce(name) // warmup (codegen)
      val w1 = runOnce(name) // settle
      jobs.clear(); stageToJob.clear()
      collecting = true
      val w2 = runOnce(name)
      collecting = false
      // listener bus is async; give it a beat to drain
      Thread.sleep(300)
      val js = jobs.values.toSeq
      val wall = math.min(w1, w2)
      println(f"\n=== $name wall=$wall%.3f s (passes $w1%.3f/$w2%.3f) " +
        f"jobs=${js.size} stages=${js.map(_.stages).sum} " +
        f"tasks=${js.map(_.tasks).sum} " +
        f"jobWallSum=${js.map(j => (j.end - j.start) / 1e3).sum}%.3f s " +
        f"cpu=${js.map(_.cpuMs).sum / 1e3}%.3f s run=${js.map(_.runMs).sum / 1e3}%.3f s ===")
      if (detail) js.foreach { j =>
        println(f"  job ${j.id}%4d ${(j.end - j.start) / 1e3}%7.3f s " +
          f"stages=${j.stages}%2d tasks=${j.tasks}%4d " +
          f"in=${j.inBytes / 1024}%6d KiB sr=${j.shufRead / 1024}%6d KiB " +
          f"sw=${j.shufWrite / 1024}%6d KiB cpu=${j.cpuMs}%6d ms  ${j.desc.take(60)}")
      }
    }
    spark.stop()
  }
}
