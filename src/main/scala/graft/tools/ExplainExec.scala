package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import graft.SparkEntry

/** Dump the FORMATTED plan of EVERY query execution a SparkEntry query
  * triggers — writes and intermediate actions included. ExplainOne only
  * explains the RETURNED frame, which for side-effecting ops (the SCD2
  * merge, the incremental blocked dataset) is just the final table
  * read; the plans that matter there belong to the writes inside the
  * op. Usage: runMain graft.tools.ExplainExec <query> [sfDir]
  * Core count from SPARK_GRAFT_CPUS (default 4). */
object ExplainExec {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = new java.lang.StringBuilder
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = out.synchronized {
        out.append(s"==== execution ($funcName) ====\n")
        out.append(qe.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        out.append('\n')
        ()
      }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    SparkEntry.queries(name)(spark, sfDir).count()
    // the listener bus is async; give it a moment to drain
    Thread.sleep(2000)
    out.synchronized(println(out.toString))
    spark.stop()
  }
}
