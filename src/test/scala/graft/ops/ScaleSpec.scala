package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin: row-identical to plain join, partitions on (key, salt)") {
    // hot key 1L carries 90% of rows
    val large = (1 to 200).map(i =>
      (if (i <= 180) 1L else i.toLong, i.toLong)).toDF("k", "payload")
    val small = Seq((1L, "hot"), (190L, "cold")).toDF("k", "label")
    val plain = large.join(small, Seq("k")).select("k", "payload", "label")
    val salted = Scale.saltedJoin(large, small, Seq("k"),
      saltSource = col("payload"), salts = 8)
      .select("k", "payload", "label")
    assert(plain.except(salted).count() == 0 &&
      salted.except(plain).count() == 0)
    assert(salted.queryExecution.executedPlan.toString
      .contains("__graft_salt"))
  }

  test("saltedAgg: two-phase sum/count/min/max equals direct aggregation") {
    val df = (1 to 300).map(i =>
      (if (i <= 280) "hot" else s"k$i", i.toDouble)).toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(sum("v").as("s"), count(col("v")).as("n"),
        min("v").as("lo"), max("v").as("hi"))
      .as[(String, Double, Long, Double, Double)].collect().toSet
    // count carries its own merge form (sum of partial counts)
    val salted = Scale.saltedAgg(df, Seq("k"), col("v"),
      aggs = Seq(
        Scale.SaltedAgg.sum("v", "s"), Scale.SaltedAgg.count("v", "n"),
        Scale.SaltedAgg.min("v", "lo"), Scale.SaltedAgg.max("v", "hi")),
      salts = 8)
      .as[(String, Double, Long, Double, Double)].collect().toSet
    assert(salted == direct)
  }

  test("bucketed co-located join runs with zero exchanges") {
    val a = (1 to 100).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 100).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    Scale.writeBucketed(a, "graft_bucket_a", Seq("k"), 4, Seq("k"))
    Scale.writeBucketed(b, "graft_bucket_b", Seq("k"), 4, Seq("k"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast strategy so bucketing is what saves the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bucket_a")
        .join(spark.table("graft_bucket_b"), Seq("k"))
      joined.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(1200))
      assert(joined.count() == 100)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("compactParquet: sizes output files from input bytes, " +
    "content-identical") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact")
      .toString
    sys.addShutdownHook(
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base)))
    val in = s"$base/in"
    val out = s"$base/out"
    val df = (1 to 5000).map(i => (i.toLong, s"payload_$i")).toDF("id", "v")
    df.repartition(40).write.parquet(in)
    def parquetFiles(dir: String): Seq[java.io.File] =
      new java.io.File(dir).listFiles().toSeq
        .filter(_.getName.endsWith(".parquet"))
    assert(parquetFiles(in).size == 40)
    val totalBytes = parquetFiles(in).map(_.length()).sum
    // target = ~half the input bytes → expect exactly 2 output files
    val n = Scale.compactParquet(spark, in, out,
      targetFileBytes = (totalBytes + 1) / 2)
    assert(n == 2, s"expected 2 output files, got $n")
    assert(parquetFiles(out).size == 2)
    // content identical
    val back = spark.read.parquet(out)
    assert(back.count() == 5000)
    assert(df.except(back).count() == 0 && back.except(df).count() == 0)
    // output files are evenly sized (round-robin, not coalesce)
    val sizes = parquetFiles(out).map(_.length())
    assert(sizes.max < sizes.min * 2, sizes.toString)
  }
}
