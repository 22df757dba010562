package graft.tools

import org.apache.spark.sql.SparkSession

/** Separate a query's PLANNING cost from its execution cost.
  *
  * `Dataset.count()` is NOT a planning-free rerun: every call builds
  * a new aggregate Dataset and a new QueryExecution, re-paying full
  * Catalyst analysis/optimization/physical planning (r18 measured
  * this the hard way — a count-vs-count split reported ~0 planning
  * for a query whose optimizer time was the dominant constant). So
  * this tool measures the phases directly on ONE QueryExecution:
  * planning = forcing `executedPlan`; execution = `toRdd.count()` on
  * that already-planned tree (whole-stage codegen compilation lands
  * in the first execution — JIT-warm by run 2).
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
      val ds = graft.SparkEntry.queries(name)(spark, sfDir)
      val qe = ds.queryExecution
      val t0 = System.nanoTime()
      qe.executedPlan
      val plan = (System.nanoTime() - t0) / 1e9
      val execs = (1 to 2).map { _ =>
        val t1 = System.nanoTime()
        qe.toRdd.count()
        (System.nanoTime() - t1) / 1e9
      }
      println(f"[planvsexec] $name run $i: plan=$plan%.2f s " +
        f"exec1=${execs.head}%.2f s exec2=${execs.last}%.2f s " +
        "(exec1-exec2 ≈ codegen/JIT)")
    }
    spark.stop()
  }
}
