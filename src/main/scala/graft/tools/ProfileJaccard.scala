package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.Dedup

/** Stage-size profile of the exact Jaccard join — counts the token,
  * prefix, raw-pair, and surviving-candidate cardinalities that drive
  * its cost, so optimization targets measurements, not guesses:
  * runMain graft.tools.ProfileJaccard */
object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val threshold = 0.4
    val eps = 1e-9
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(graft.GraftSession.tune(spark), sfDir,
      "documents")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val sh = docs.select(col("doc_id").as("id"),
      Dedup.shingles(col("text"), 3).as("sh"))
    val tok = sh.select(col("id"), size(col("sh")).as("len"),
      explode(col("sh")).as("t"))
    timed("docs")(println("[profile] n_docs=" + docs.count()))
    timed("tokens")(println("[profile] n_tok=" + tok.count()))
    val wTok = org.apache.spark.sql.expressions.Window.partitionBy(col("t"))
    val wDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
      .orderBy(col("tdf"), col("t"))
    val prefix = tok
      .withColumn("tdf", count(lit(1)).over(wTok))
      .withColumn("pos", row_number().over(wDoc))
      .filter(col("pos") <=
        col("len") - ceil(lit(threshold) * col("len") - eps) + 1)
      .select(col("t"), col("id"), col("len"), col("pos"))
    timed("prefix")(println("[profile] n_prefix=" + prefix.count()))
    val buckets = prefix.groupBy(col("t")).count()
      .filter(col("count") >= 2)
    timed("buckets") {
      val top = buckets.orderBy(col("count").desc).limit(10).collect()
      println("[profile] n_shared_tokens=" + buckets.count())
      println("[profile] raw_pairs_sum_k2=" +
        buckets.agg(sum(col("count") * col("count"))).first().getLong(0))
      top.foreach(r => println("[profile] top_bucket " +
        r.getString(0) + " -> " + r.getLong(1)))
    }
    val cands = prefix
      .groupBy(col("t"))
      .agg(collect_list(struct(col("id"), col("len"), col("pos")))
        .as("items"))
      .filter(size(col("items")) >= 2)
      .select(explode(col("items")).as("a"), col("items"))
      .select(col("a"), explode(col("items")).as("b"))
      .filter(col("a.id") < col("b.id"))
      .filter(least(col("a.len"), col("b.len")).cast("double") >=
        lit(threshold) * greatest(col("a.len"), col("b.len")) - eps)
      .filter(lit(1) +
        least(col("a.len") - col("a.pos"), col("b.len") - col("b.pos")) >=
        ceil(lit(threshold / (1 + threshold)) *
          (col("a.len") + col("b.len")) - eps))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .dropDuplicates("id1", "id2")
    // warm everything once, then time each sub-plan twice
    cands.count(); prefix.count()
    val sh1 = sh.select(col("id").as("id1"), col("sh").as("sh1"))
    val sh2 = sh.select(col("id").as("id2"), col("sh").as("sh2"))
    val join1 = cands.join(sh1, Seq("id1"))
    val join2 = join1.join(sh2, Seq("id2"))
    val withJ = join2.withColumn("__j", Dedup.jaccard(col("sh1"), col("sh2")))
      .filter(col("__j") >= threshold)
    (1 to 2).foreach { i =>
      timed(s"warm$i cands")(println("[profile] n_cands=" + cands.count()))
      timed(s"warm$i join1")(println("[profile] n_join1=" + join1.count()))
      timed(s"warm$i join2")(println("[profile] n_join2=" + join2.count()))
      timed(s"warm$i jaccard")(println("[profile] n_j=" + withJ.count()))
      timed(s"warm$i full")(println("[profile] n_result=" +
        Dedup.jaccardSimilarityJoin(docs, "doc_id", "text", threshold, 3)
          .count()))
    }
    // A/B the jaccard formulations over the SAME cached candidate pairs,
    // isolating expression cost from the upstream pipeline
    import org.apache.spark.sql.Column
    val pairs = join2.persist()
    println("[profile] cached_pairs=" + pairs.count())
    def naive(a: Column, b: Column) =
      when(size(array_union(a, b)) === 0, lit(0.0)).otherwise(
        size(array_intersect(a, b)).cast("double") /
          size(array_union(a, b)))
    def sized(a: Column, b: Column) = {
      val c = size(array_intersect(a, b))
      val u = size(a) + size(b) - c
      when(u === 0, lit(0.0)).otherwise(c.cast("double") / u)
    }
    (1 to 2).foreach { i =>
      timed(s"ab$i naive_intersect_union")(
        pairs.filter(naive(col("sh1"), col("sh2")) >= threshold).count())
      timed(s"ab$i sized_intersect")(
        pairs.filter(sized(col("sh1"), col("sh2")) >= threshold).count())
      timed(s"ab$i native_intersect_size")(
        pairs.filter(Dedup.jaccard(col("sh1"), col("sh2")) >= threshold)
          .count())
    }
    pairs.unpersist()
    spark.stop()
  }
}
