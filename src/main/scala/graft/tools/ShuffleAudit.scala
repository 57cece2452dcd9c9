package graft.tools

import java.util.concurrent.atomic.AtomicLong

import graft.{PlanDump, Sessions, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Measures what SCALE.md's shuffle inventory CLAIMS, per headline query:
  * shuffle bytes written/read and spill — captured from real task
  * metrics via a SparkListener, not inferred from plans. (Input bytes are
  * deliberately NOT reported: the local filesystem's positioned-read path
  * bypasses the Hadoop statistics the input metric feeds from, so the
  * column under-reports columnar scans.) The numbers quantify the design
  * rules the library is built on:
  *
  *  - map-side partial aggregation: the agg queries shuffle grouped
  *    partials, never raw rows (q1_agg: ~KBs of shuffle for an 11 MB
  *    fact table);
  *  - "0 data shuffles" claims (txt_stats, tx_struct_slots, sim_topk_*):
  *    shuffle bytes ≈ presentation-sort + final-gather KBs only;
  *  - banding/blocking: the dedup pair joins shuffle band keys and
  *    signatures, not document text;
  *  - spill-free execution at bench scale (memory/disk spill = 0).
  *
  * Usage: runMain graft.tools.ShuffleAudit [sfDir] — prints one markdown
  * table row per headline query (paste target: SCALE.md "Measured shuffle
  * volumes").
  */
object ShuffleAudit {

  private class MetricsListener extends SparkListener {
    val shuffleWrite = new AtomicLong
    val shuffleRead = new AtomicLong
    val memSpill = new AtomicLong
    val diskSpill = new AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
      }
    }
    def reset(): Unit =
      Seq(shuffleWrite, shuffleRead, memSpill, diskSpill).foreach(_.set(0))
    def snapshot: Long =
      shuffleWrite.get + shuffleRead.get + memSpill.get + diskSpill.get
  }

  /** Deterministic listener drain: flush the bus via
    * `SparkContext.listenerBus.waitUntilEmpty` (private[spark] — reached by
    * reflection), so late TaskEnd events can't land after reset() and get
    * billed to the NEXT query. If the internal API ever moves, fall back to
    * polling the counters until two consecutive reads agree — still
    * event-driven, never a blind fixed sleep.
    */
  private def drain(spark: org.apache.spark.sql.SparkSession,
                    listener: MetricsListener): Unit = {
    val flushed =
      try {
        val sc = spark.sparkContext
        sc.getClass.getMethods.find(_.getName == "listenerBus")
          .map(_.invoke(sc))
          .exists { bus =>
            bus.getClass.getMethods.find(_.getName == "waitUntilEmpty").exists { m =>
              if (m.getParameterCount == 0) m.invoke(bus)
              else m.invoke(bus, java.lang.Long.valueOf(30000L))
              true
            }
          }
      } catch { case _: Throwable => false }
    if (!flushed) {
      // require the counters stable for a FULL second (10 consecutive
      // 100 ms polls), not merely two agreeing reads: right after save()
      // the bus may hold queued events that haven't produced a TaskEnd
      // yet, and a single quiet 100 ms window would exit early and bill
      // the late events to the next query — the exact race drain()
      // exists to prevent. Matches the old flat sleep's 1 s tolerance
      // while still exiting as soon as the bus is genuinely quiet.
      var prev = listener.snapshot
      var stable = 0
      var spins = 0
      while (stable < 10 && spins < 100) {
        Thread.sleep(100)
        val cur = listener.snapshot
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
        spins += 1
      }
    }
  }

  // two decimals: pruned-column scans and partial-agg shuffles are often
  // tens of KB — the whole point of the audit is that they are NOT MBs
  private def mb(b: Long): String = f"${b / 1048576.0}%.2f"

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    // optional comma-separated name filter (args(1)) for targeted audits;
    // unknown names fail fast, same contract as Bench's filter
    val names = if (args.length > 1) {
      val f = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val unknown = f.filterNot(SparkEntry.queries.keySet)
      require(unknown.isEmpty, s"unknown query names: ${unknown.mkString(", ")}")
      f
    } else PlanDump.headline
    val spark = Sessions.base("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    val listener = new MetricsListener
    spark.sparkContext.addSparkListener(listener)
    println(s"| query | shuffle write MB | shuffle read MB | spill MB |")
    println(s"|---|---|---|---|")
    names.foreach { name =>
      listener.reset()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      drain(spark, listener)
      spark.catalog.clearCache()
      println(s"| $name | ${mb(listener.shuffleWrite.get)} | " +
        s"${mb(listener.shuffleRead.get)} | " +
        s"${mb(listener.memSpill.get + listener.diskSpill.get)} |")
    }
    spark.stop()
  }
}
