package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.GraftSession

/** State-growth measurement for the CHAINED-stateful streaming
  * distinct-count ([[graft.streaming.EventStreams.windowedDistinctUsers]]
  * — dedup on (window, user) feeding a windowed agg): replays a
  * FACTOR× events corpus (ScaleSweep's staging) as TIME-ORDERED
  * micro-batches and reports, per batch, the state rows of BOTH
  * operators. The documented contract under test: both states are
  * bounded by the LIVE windows' keys — because the chunks arrive in
  * event-time order, the watermark advances every batch and closed
  * windows evict, so state must PLATEAU at ≈ the distinct
  * (window, user) pairs inside the watermark horizon while the corpus
  * grows without bound.
  *
  * runMain graft.tools.DistinctStateSweep [factor] [chunks]
  */
object DistinctStateSweep {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(30)
    val chunks = args.lift(1).map(_.toInt).getOrElse(8)
    val scaled = s"/tmp/graft_scale_x$factor"
    if (!new java.io.File(s"$scaled/_DONE_EVENTS").exists())
      ScaleSweep.main(Array(factor.toString, "__stage_only__"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    // time-ordered chunks (day ranges), mtime-ordered so the file
    // source replays them as in-order micro-batches — the watermark
    // advances monotonically, the realistic arrival model
    val in = s"$scaled/distinct_in_$chunks"
    if (!new java.io.File(s"$in/_DONE").exists()) {
      val ev = spark.read.parquet(s"$scaled/events.parquet")
      val bounds = (0 to chunks).map(i => 1 + i * 31 / chunks)
      bounds.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), c) =>
        val scratch = java.nio.file.Files
          .createTempDirectory("graft_dchunk").toString
        ev.filter(dayofmonth(col("ts")) >= lo &&
            dayofmonth(col("ts")) < hi)
          .coalesce(1).write.mode("overwrite").parquet(scratch)
        val part = new java.io.File(scratch).listFiles()
          .filter(_.getName.startsWith("part-")).head
        val dst = new java.io.File(in, f"c$c%03d.parquet")
        dst.getParentFile.mkdirs()
        java.nio.file.Files.copy(part.toPath, dst.toPath)
        dst.setLastModified(1700000000000L + c * 10000L)
      }
      new java.io.File(s"$in/_DONE").createNewFile(); ()
    }

    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_dstate_ck").toString
    val stream = graft.streaming.EventStreams.readStream(spark, in,
      options = Map("maxFilesPerTrigger" -> "1"))
    // op selector: "distinct" (chained dedup+agg — state grows with
    // distinct (window, user) pairs in the horizon) vs "kmv" (the
    // flatMapGroupsWithState sketch — ≤k hashes per live window, so
    // state must stay ~flat at any factor)
    val op = args.lift(2).getOrElse("distinct")
    val plan =
      if (op == "kmv")
        graft.streaming.EventStreams.kmvDistinctStream(stream).toDF()
      else graft.streaming.EventStreams
        .windowedDistinctUsers(stream, "1 hour", "2 hours")
    val q = plan
      .writeStream.format("noop")
      .option("checkpointLocation", s"$ckpt/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = q.recentProgress.toSeq
      .filter(_.numInputRows > 0)
      .sortBy(_.batchId)
      .map(p => (p.batchId, p.numInputRows,
        p.stateOperators.map(_.numRowsTotal).toSeq))
    rows.foreach { case (b, nin, st) =>
      println(s"[distinctstate] batch=$b input=$nin " +
        s"state_per_operator=${st.mkString("/")}")
    }
    val peaks = rows.flatMap(_._3.zipWithIndex)
      .groupBy(_._2).map { case (i, v) => i -> v.map(_._1).max }
    println(s"[distinctstate] factor=$factor chunks=$chunks " +
      s"peak_state=${peaks.toSeq.sortBy(_._1).map(_._2).mkString("/")} " +
      s"final_state=${rows.lastOption.map(_._3.mkString("/")).getOrElse("-")}")
    spark.stop()
  }
}
