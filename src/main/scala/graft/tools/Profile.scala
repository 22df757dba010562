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
    // stage-wise decomposition of lshCandidates
    locally {
      import org.apache.spark.sql.expressions.Window
      val sig = docs.select(col("doc_id").as("id"),
        Dedup.minhashSignature(Dedup.shingles(col("text"), 3), 32).as("sig"))
      val banded = sig.select(col("id"), col("sig"),
          explode(Dedup.lshBands(col("sig"), 16, 2)).as("bk"))
        .select(col("id"), col("sig"), col("bk.band"), col("bk.bucket"))
      time("  banded")(banded.count())
      val small = banded.withColumn("bucket_n",
          count(lit(1)).over(Window.partitionBy(col("band"), col("bucket"))))
        .filter(col("bucket_n") <= 1000)
      time("  windowed")(small.count())
      val l = small.select(col("band"), col("bucket"), col("id").as("id1"),
        col("sig").as("sig1"))
      val r = small.select(col("band"), col("bucket"), col("id").as("id2"),
        col("sig").as("sig2"))
      val joined = l.join(r, Seq("band", "bucket")).filter(col("id1") < col("id2"))
      time("  join no jaccard")(joined.select("id1", "id2").count())
      time("  join distinct")(joined.select("id1", "id2")
        .dropDuplicates("id1", "id2").count())
    }
    time("lshCandidates")(Dedup.lshCandidates(docs, "doc_id", "text", 3, 32, 16).count())
    time("nearDuplicates")(Dedup.nearDuplicates(docs, "doc_id", "text", 0.5, 3, 32, 16).count())
    spark.stop()
  }
}
