package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.Dedup

object Profile {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.tune(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    time("warmup count")(docs.count())
    time("md5 only")(docs.select(md5(col("text")).as("h"))
      .groupBy("h").count().count())
    time("lower only")(docs.select(md5(lower(col("text"))).as("h"))
      .groupBy("h").count().count())
    time("normalize native")(docs.select(
      md5(graft.text.TextOps.normalize(col("text"))).as("h"))
      .groupBy("h").count().count())
    time("normalize regex twin")(docs.select(
      md5(graft.text.TextOps.normalizeCols(col("text"))).as("h"))
      .groupBy("h").count().count())
    time("exactByContent norm")(
      Dedup.exactByContent(docs, "doc_id", "text", normalized = true).count())
    time("shingles")(docs.select(Dedup.shingles(col("text"), 3).as("sh"))
      .agg(sum(size(col("sh")))).head().getLong(0))
    time("signature")(docs.select(
      Dedup.minhashSignature(Dedup.shingles(col("text"), 3), 32).as("sig"))
      .agg(sum(size(col("sig")))).head().getLong(0))
    time("lshCandidates")(Dedup.lshCandidates(docs, "doc_id", "text", 3, 32, 16).count())
    time("nearDuplicates")(Dedup.nearDuplicates(docs, "doc_id", "text", 0.5, 3, 32, 16).count())
    time("simhashCandidates")(Dedup.simhashCandidates(docs, "doc_id", "text", 3).count())
    spark.stop()
  }
}
