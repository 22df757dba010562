package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timings for t_decontaminate_bloom at sf0.1:
  * runMain graft.tools.ProfileBloom */
object ProfileBloom {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(graft.GraftSession.tune(spark), sfDir,
      "documents")
    val train = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
    val evalSet = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[bloomprof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm
    time("warm shingle count (eval)") {
      evalSet.select(explode(graft.text.Dedup.shingles(col("text"), 3)))
        .count()
    }
    (1 to 2).foreach { i =>
      time(s"run $i: bloom build only (count + stat.bloomFilter)") {
        val hashes = evalSet
          .select(explode(graft.text.Dedup.shingles(col("text"), 3)).as("s"))
          .select(xxhash64(col("s")).as("h"))
        hashes.stat.bloomFilter("h", math.max(64L, hashes.count()), 0.03)
      }
      time(s"run $i: bloomPrune filter (prune only)") {
        graft.text.Dedup.bloomPrune(train, evalSet, "text", 0.5, 3,
          -1L, 0.03).count()
      }
      time(s"run $i: full decontaminateBloom") {
        graft.text.Dedup.decontaminateBloom(train, evalSet, "doc_id",
          "text", 0.5, 3, 32, 16, expectedShingles = -1L).count()
      }
    }
    spark.stop()
  }
}
