package graft.tools

import graft.{GraftSession, Materialize, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Fresh-JVM single-gate profiler: `runMain graft.tools.GateProf <name> [reps]`
  * against `SPARK_GRAFT_SF_DIR`. Beyond GateTime's wall clock it reports,
  * per rep: Spark job count, stage count, task count, summed task time,
  * summed shuffle read/write bytes, and summed GC time — enough to decide
  * whether a gate's wall time is scheduling overhead (many tiny jobs/
  * stages), shuffle volume, or real compute (guide §1/§7 empirical loop).
  */
object GateProf {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: GateProf <query> [reps]"))
    val reps = if (args.length > 1) args(1).toInt else 2
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskTimeMs = new AtomicLong
    val gcTimeMs = new AtomicLong
    val shufRead = new AtomicLong
    val shufWrite = new AtomicLong
    val input = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskTimeMs.addAndGet(m.executorRunTime)
          gcTimeMs.addAndGet(m.jvmGCTime)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          input.addAndGet(m.inputMetrics.bytesRead)
        }
      }
    })
    val fn = SparkEntry.queries(name)
    for (i <- 1 to reps) {
      Seq(jobs, stages, tasks).foreach(_.set(0))
      Seq(taskTimeMs, gcTimeMs, shufRead, shufWrite, input).foreach(_.set(0))
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async: let the queue drain before reading counters
      Thread.sleep(500)
      println(f"PROF $name run$i: wall=$wall%.2fs rows=$n jobs=${jobs.get} " +
        f"stages=${stages.get} tasks=${tasks.get} taskTime=${taskTimeMs.get / 1e3}%.1fs " +
        f"gc=${gcTimeMs.get / 1e3}%.1fs input=${input.get / 1e6}%.1fMB " +
        f"shufR=${shufRead.get / 1e6}%.1fMB shufW=${shufWrite.get / 1e6}%.1fMB")
      Materialize.sweep(spark)
    }
    spark.stop()
  }
}
