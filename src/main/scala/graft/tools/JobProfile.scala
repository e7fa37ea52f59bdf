package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler._

import scala.collection.mutable

/** Dev-only: per-Spark-job wall/shuffle attribution for ONE query
  * invocation — the measure-first instrument for composite queries
  * (view refresh, delete verbs, stream drains) whose wall is a chain of
  * many jobs plus driver-side commit work. For each rep prints one line
  * per job (wall, tasks, shuffle read/write, input/output bytes, the
  * job group description when set) plus the DRIVER GAP — total rep wall
  * minus the union of job intervals — which is manifest I/O, planning,
  * checkpoint machinery and everything else not inside a job.
  *
  * Usage: runMain graft.tools.JobProfile <sfDir> <reps> <name> [name...]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = ProbeCorpus.session()

    case class J(id: Int, var t0: Long = 0L, var t1: Long = 0L,
        var desc: String = "", var tasks: Int = 0, var shufR: Long = 0L,
        var shufW: Long = 0L, var in: Long = 0L, var out: Long = 0L,
        var taskTime: Long = 0L)
    val jobs = mutable.LinkedHashMap[Int, J]()
    val stageToJob = mutable.HashMap[Int, Int]()
    @volatile var record = false
    val lock = new Object
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (record) lock.synchronized {
          val d = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          val j = J(e.jobId); j.t0 = e.time; j.desc = d
          jobs(e.jobId) = j
          e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
        }
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        if (record) lock.synchronized {
          stageToJob.get(e.stageInfo.stageId).flatMap(jobs.get).foreach { j =>
            if (!j.desc.contains(e.stageInfo.name.take(60)))
              j.desc = (j.desc + " | " + e.stageInfo.name.take(60)).take(200)
          }
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        if (record) lock.synchronized {
          jobs.get(e.jobId).foreach(_.t1 = e.time)
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (record) lock.synchronized {
          stageToJob.get(e.stageId).flatMap(jobs.get).foreach { j =>
            j.tasks += 1
            val m = e.taskMetrics
            if (m != null) {
              j.shufR += m.shuffleReadMetrics.totalBytesRead
              j.shufW += m.shuffleWriteMetrics.bytesWritten
              j.in += m.inputMetrics.bytesRead
              j.out += m.outputMetrics.bytesWritten
              j.taskTime += m.executorRunTime
            }
          }
        }
    })

    def mb(b: Long): String = f"${b / 1e6}%.1f"
    names.foreach { name =>
      // one untimed warmup so codegen/JIT doesn't pollute the profile
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (1 to reps).foreach { r =>
        // Bench-style settle: without it, deferred broadcast/checkpoint
        // cleanup from the previous rep lands inside this rep's wall
        System.gc(); Thread.sleep(250)
        var lastJit = java.lang.management.ManagementFactory
          .getCompilationMXBean.getTotalCompilationTime
        var waited = 0
        while (waited < 8000) {
          Thread.sleep(200)
          val now = java.lang.management.ManagementFactory
            .getCompilationMXBean.getTotalCompilationTime
          if (now - lastJit < 20) waited = 8000
          else { lastJit = now; waited += 200 }
        }
        lock.synchronized { jobs.clear(); stageToJob.clear() }
        record = true
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        record = false
        // let stragglers' end events drain before reading
        Thread.sleep(200)
        val snap = lock.synchronized { jobs.values.toSeq.sortBy(_.t0) }
        println(f"== $name rep$r wall=$wall%.3f s jobs=${snap.size}")
        // union of [t0,t1] intervals = time covered by at least one job
        val iv = snap.filter(_.t1 > 0).map(j => (j.t0, j.t1)).sortBy(_._1)
        var covered = 0L; var curS = Long.MinValue; var curE = Long.MinValue
        iv.foreach { case (s, e) =>
          if (s > curE) { covered += math.max(0L, curE - curS); curS = s; curE = e }
          else curE = math.max(curE, e)
        }
        covered += math.max(0L, curE - curS)
        println(f"   job-covered=${covered / 1e3}%.3f s driver-gap=${wall - covered / 1e3}%.3f s")
        snap.foreach { j =>
          val w = if (j.t1 > 0) (j.t1 - j.t0) / 1e3 else -1.0
          println(f"   job ${j.id}%4d ${w}%7.3f s tasks=${j.tasks}%4d " +
            f"ttime=${j.taskTime / 1e3}%6.2f shufR=${mb(j.shufR)}%7s " +
            f"shufW=${mb(j.shufW)}%7s in=${mb(j.in)}%7s " +
            f"out=${mb(j.out)}%7s  ${j.desc.take(140)}")
        }
      }
    }
    spark.stop()
  }
}
