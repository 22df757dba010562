package graft.tools

import org.apache.spark.sql.SparkSession

/** Separate a query's PLANNING+CODEGEN cost from its execution cost:
  * count() on a fresh Dataset instance pays analysis, optimization,
  * physical planning and whole-stage codegen compilation; a second
  * count() on the SAME instance reuses the cached QueryExecution and
  * pays only the job. A query whose fresh-instance time dwarfs its
  * same-instance time is bottlenecked on plan/codegen constant cost
  * (irrelevant at 100 TB), not on data work.
  *
  * Usage: runMain graft.tools.PlanVsExec <query> [runs]
  */
object PlanVsExec {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val ds = graft.SparkEntry.queries(name)(spark, sfDir)
      ds.count()
      val fresh = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      ds.count()
      val reused = (System.nanoTime() - t1) / 1e9
      println(f"[planvsexec] $name run $i: fresh=$fresh%.2f s " +
        f"reused=$reused%.2f s (plan+codegen ≈ ${fresh - reused}%.2f s)")
    }
    spark.stop()
  }
}
