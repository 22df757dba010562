package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-batch timeline profiler for the bounded streaming drains:
  * runs one (or more) `s_stream_*` queries with a
  * StreamingQueryListener attached and prints, per micro-batch, the
  * engine's own durationMs breakdown (triggerExecution, queryPlanning,
  * walCommit, getBatch, addBatch, commitOffsets) plus state-operator
  * commit times — the measurement surface for the streaming-floor
  * work (r17 VERDICT item 2). Wall clock per query is printed last,
  * so listener overhead stays visible.
  *
  * Usage: runMain graft.tools.StreamProfile s_stream_join [more...]
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq("s_stream_join")
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val events =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener =
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryStartedEvent): Unit =
          events.add(s"START ${e.name} at ${System.currentTimeMillis()}")
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryProgressEvent): Unit = {
          val p = e.progress
          val dur = p.durationMs
          val state = p.stateOperators.map(s =>
            s"rows=${s.numRowsTotal} commitMs=${s.commitTimeMs}")
            .mkString(";")
          events.add(
            s"BATCH ${p.name}#${p.batchId} rows=${p.numInputRows} " +
            s"total=${dur.get("triggerExecution")} " +
            s"plan=${dur.get("queryPlanning")} wal=${dur.get("walCommit")} " +
            s"getBatch=${dur.get("getBatch")} latestOffset=${dur.get("latestOffset")} " +
            s"addBatch=${dur.get("addBatch")} " +
            s"commit=${dur.get("commitOffsets")} [$state]")
        }
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryTerminatedEvent): Unit =
          events.add(s"END at ${System.currentTimeMillis()}")
      }
    spark.streams.addListener(listener)
    names.foreach { name =>
      // run 1 = staging + first drain; run 2 = steady state
      (1 to 2).foreach { i =>
        events.clear()
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let the terminate event land
        println(s"==== $name run $i: rows=$n wall=${f"$wall%.2f"} s")
        events.forEach(l => println(s"  $l"))
      }
    }
    spark.stop()
  }
}
