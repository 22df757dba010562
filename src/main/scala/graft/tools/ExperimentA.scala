package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** Scratch experiment: does fanning a single-row-group scan out over
  * the cores speed up CPU-bound narrow pipelines? (guide §1: measure
  * before changing). */
object ExperimentA {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)

    def time(tag: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[exp] $tag run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }

    val li = Tables.load(spark, sfDir, "lineitem")
    time("corr as-is") {
      graft.ops.Quality.corrPairs(li,
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")).count()
    }
    time("corr fanout") {
      graft.ops.Quality.corrPairs(li.repartition(32, col("l_orderkey")),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")).count()
    }
    val docs = Tables.load(spark, sfDir, "documents")
    time("neardup as-is") {
      graft.text.Dedup.nearDuplicates(docs, "doc_id", "text", 0.5,
        3, 32, 16).count()
    }
    time("neardup fanout") {
      graft.text.Dedup.nearDuplicates(docs.repartition(32, col("doc_id")),
        "doc_id", "text", 0.5, 3, 32, 16).count()
    }
    spark.stop()
  }
}
