package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.GraftSession

/** State-growth measurement for the STREAMING near-dup candidate
  * operator ([[graft.streaming.EventStreams.nearDupCandidatesStream]]):
  * replays a FACTOR× decorrelated documents corpus (ScaleSweep's
  * staging) through a chunked AvailableNow run and reports the state
  * store's row count (= live LSH band-buckets) per micro-batch, WITH
  * and WITHOUT idle eviction.
  *
  * The operator's documented contract: state per bucket is ≤ maxBucket
  * members, but bucket COUNT grows with the corpus — unbounded on an
  * unbounded stream unless idle buckets are evicted, with the persisted
  * [[graft.text.LshIndex]] as the beyond-horizon tier. This tool turns
  * that contract into numbers for BENCH_SF1.md.
  *
  * runMain graft.tools.StateSweep [factor] [chunks]
  */
object StateSweep {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(30)
    val chunks = args.lift(1).map(_.toInt).getOrElse(8)
    val scaled = s"/tmp/graft_scale_x$factor"
    if (!new java.io.File(s"$scaled/_DONE").exists())
      ScaleSweep.main(Array(factor.toString, "__stage_only__"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    // chunked replay input: one file per chunk, mtime-ordered, so
    // maxFilesPerTrigger=1 yields `chunks` micro-batches in order
    val in = s"$scaled/state_in_$chunks"
    if (!new java.io.File(s"$in/_DONE").exists()) {
      val docs = spark.read.parquet(s"$scaled/documents.parquet")
      (0 until chunks).foreach { c =>
        val scratch = java.nio.file.Files
          .createTempDirectory("graft_chunk").toString
        docs.filter(pmod(col("doc_id"), lit(chunks)) === c)
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

    val docSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, lang STRING, source STRING, " +
        "n_chars BIGINT")
    // runBoundedWithTimeouts, not awaitTermination: a processing-time-
    // timeout query under AvailableNow never self-terminates (the
    // operator's documented caution)
    def run(evict: Option[Long], tag: String): Seq[Long] = {
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_state_ck").toString
      val stream = spark.readStream.schema(docSchema)
        .option("maxFilesPerTrigger", "1").parquet(in)
      val rows = graft.streaming.EventStreams.runBoundedWithTimeouts(
        graft.streaming.EventStreams.nearDupCandidatesStream(
          stream, "doc_id", "text", shingleN = 3, numHashes = 32,
          bands = 16, evictIdleAfterMs = evict).toDF(),
        checkpoint = s"$ckpt/ckpt", expectDataBatches = chunks,
        timeoutMs = 1800000L,
        // harness drain: state ROW totals are partition-invariant,
        // but the per-batch commit fan-out is not — pin the same
        // count the bench drains use so wall time stays comparable
        statePartitions = Some(8))
        .collect { case (nin, st) if nin > 0 => st }
      println(s"[statesweep] $tag per-data-batch state rows: " +
        rows.mkString(", "))
      rows
    }

    val noEvict = run(None, s"x$factor no-evict")
    // 1 ms idle horizon: any bucket untouched by the current batch
    // times out by the next — the tightest horizon, i.e. the LOWER
    // bound of retained state (a real deployment picks the horizon to
    // match its late-duplicate tolerance; beyond it, LshIndex)
    val evicted = run(Some(1L), s"x$factor evict-1ms")
    println(f"[statesweep] factor=$factor chunks=$chunks " +
      f"final_state_no_evict=${noEvict.lastOption.getOrElse(0L)} " +
      f"peak_state_no_evict=${if (noEvict.isEmpty) 0L else noEvict.max} " +
      f"final_state_evicted=${evicted.lastOption.getOrElse(0L)} " +
      f"peak_state_evicted=${if (evicted.isEmpty) 0L else evicted.max}")
    spark.stop()
  }
}
