package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

import graft.{Sessions, SparkEntry}

/** Stage-level attribution for one query: runs the named query with the
  * noop sink and prints per-job and per-stage wall/task times with call
  * sites — the "which operator is the time going to" step of guide §1
  * when the UI is disabled.
  *
  * Usage: runMain graft.tools.ProfileQuery <sfDir> <query> [nRuns]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val nRuns = if (args.length > 2) args(2).toInt else 2
    val spark = Sessions.fromEnv()
    spark.sparkContext.setLogLevel("ERROR")

    case class StageRow(id: Int, name: String, ms: Long, taskMs: Long,
        tasks: Int, shuffleReadMB: Double, shuffleWriteMB: Double)
    val stages = mutable.ArrayBuffer[StageRow]()
    val jobs = mutable.Map[Int, (Long, String)]()
    val jobRows = mutable.ArrayBuffer[(Int, Long, String)]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        stages += StageRow(si.stageId, si.name, wall,
          si.taskMetrics.executorRunTime, si.numTasks,
          si.taskMetrics.shuffleReadMetrics.totalBytesRead / 1e6,
          si.taskMetrics.shuffleWriteMetrics.bytesWritten / 1e6)
      }
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs(js.jobId) = (js.time,
          Option(js.properties.getProperty("spark.job.description")).getOrElse(""))
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.remove(je.jobId).foreach { case (t0, desc) =>
          jobRows += ((je.jobId, je.time - t0, desc))
        }
    }

    // warm: JVM + codegen + footers (run 1 discarded)
    val fn = SparkEntry.queries(name)
    (1 to nRuns).foreach { i =>
      stages.clear(); jobRows.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val elapsed = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      if (i == 1) spark.sparkContext.addSparkListener(listener)
      if (i == nRuns) {
        // listener events are async; give the bus a moment
        Thread.sleep(500)
        println(f"== $name run$i: $elapsed%.3f s, ${jobRows.size} jobs, ${stages.size} stages")
        jobRows.sortBy(-_._2).take(30).foreach { case (id, ms, desc) =>
          println(f"  job $id%4d ${ms}%6d ms  $desc")
        }
        println("  -- stages by wall ms --")
        stages.sortBy(-_.ms).take(30).foreach { s =>
          println(f"  stage ${s.id}%4d wall=${s.ms}%6d ms taskSum=${s.taskMs}%7d ms " +
            f"tasks=${s.tasks}%3d sr=${s.shuffleReadMB}%8.2f MB sw=${s.shuffleWriteMB}%8.2f MB  ${s.name.take(110)}")
        }
      }
    }
    spark.stop()
  }
}
