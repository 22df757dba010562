package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Per-job/per-stage wall-clock breakdown of ONE SparkEntry query in
  * Bench's session context — the guide-§1 "where is the time going"
  * probe for a headless box (no Spark UI): one untimed warm run
  * (codegen/JIT, staging caches), then one instrumented run with a
  * listener recording every job's wall time and every stage's task
  * time / shuffle bytes.
  *
  *   runMain graft.tools.JobProfile <query> [runs]
  *
  * Output: total wall, then per-job lines (submit→complete wall,
  * stage count) and per-stage lines (name, task count, executor run
  * time, shuffle read/write bytes), plus the driver-side gap — time
  * between jobs that no job accounts for (driver work: planning,
  * collects, codebook folds). */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val runs = args.lift(1).map(_.toInt).getOrElse(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)

    fn(spark, sfDir).count() // warm: codegen + JIT + per-dir staging

    case class JobRec(id: Int, submitted: Long, var completed: Long = -1L,
                      var stages: Int = 0)
    case class StageRec(id: Int, name: String, var tasks: Int = 0,
                        var runTimeMs: Long = 0L, var shufRead: Long = 0L,
                        var shufWrite: Long = 0L, var inputBytes: Long = 0L)
    val jobs = scala.collection.mutable.LinkedHashMap.empty[Int, JobRec]
    val stages = scala.collection.mutable.LinkedHashMap.empty[Int, StageRec]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          jobs(e.jobId) = JobRec(e.jobId, e.time, stages = e.stageIds.size)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.completed = e.time) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.synchronized {
          val i = e.stageInfo
          val r = stages.getOrElseUpdate(i.stageId,
            StageRec(i.stageId, i.name.takeWhile(_ != '\n').take(90)))
          r.tasks += i.numTasks
          r.runTimeMs += i.taskMetrics.executorRunTime
          r.shufRead += i.taskMetrics.shuffleReadMetrics.totalBytesRead
          r.shufWrite += i.taskMetrics.shuffleWriteMetrics.bytesWritten
          r.inputBytes += i.taskMetrics.inputMetrics.bytesRead
        }
    }
    spark.sparkContext.addSparkListener(listener)
    (1 to runs).foreach { r =>
      jobs.clear(); stages.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wallS = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain (private API in 4.x)
      println(f"[profile] $name run $r wall ${wallS}%.3f s, " +
        s"${jobs.size} jobs, ${stages.size} stages")
      val js = jobs.values.toSeq.sortBy(_.submitted)
      var accounted = 0L
      js.foreach { j =>
        val w = if (j.completed > 0) j.completed - j.submitted else -1L
        accounted += math.max(w, 0L)
        println(f"[profile]   job ${j.id}%3d wall ${w / 1000.0}%7.3f s  " +
          s"stages ${j.stages}")
      }
      println(f"[profile]   jobs-accounted ${accounted / 1000.0}%.3f s; " +
        f"driver-gap ${wallS - accounted / 1000.0}%.3f s")
      stages.values.toSeq.sortBy(-_.runTimeMs).take(12).foreach { s =>
        println(f"[profile]   stage ${s.id}%3d task-time ${s.runTimeMs / 1000.0}%7.3f s  " +
          f"tasks ${s.tasks}%3d  in ${s.inputBytes / 1e6}%8.1f MB  " +
          f"sr ${s.shufRead / 1e6}%7.1f MB  sw ${s.shufWrite / 1e6}%7.1f MB  ${s.name}")
      }
    }
    spark.stop()
  }
}
