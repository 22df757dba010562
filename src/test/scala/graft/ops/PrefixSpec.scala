package graft.ops

import graft.SparkSpec

class PrefixSpec extends SparkSpec {
  import spark.implicits._

  test("strictBelow: per-group strict-below sums for two measures, " +
    "negative keys cross the truncating-div bucket seam correctly, " +
    "tiny buckets agree with one big bucket") {
    val df = Seq(
      ("g1", -3L, 1L, 10L), ("g1", -1L, 2L, 20L), ("g1", 0L, 4L, 40L),
      ("g1", 5L, 8L, 80L),
      ("g2", 0L, 100L, 1L)
    ).toDF("g", "k", "m1", "m2")
    def run(b: Long) = Prefix
      .strictBelow(df, Seq("g"), "k", Seq("m1", "m2"), bucketSize = b)
      .select("g", "k", "__below_m1", "__below_m2")
      .as[(String, Long, Long, Long)].collect().toSet
    val want = Set(
      ("g1", -3L, 0L, 0L), ("g1", -1L, 1L, 10L), ("g1", 0L, 3L, 30L),
      ("g1", 5L, 7L, 70L),
      ("g2", 0L, 0L, 0L))
    // bucketSize 2: keys -3|-1,0|5 straddle three buckets including
    // the widened truncation bucket 0 spanning (-2, 2)
    assert(run(2L) == want, run(2L).toString)
    assert(run(1048576L) == want, run(1048576L).toString)
  }

  test("strictBelow: groupless frames work (empty groupCols)") {
    val df = Seq((1L, 1L), (2L, 1L), (7L, 1L)).toDF("k", "c")
    val got = Prefix.strictBelow(df, Nil, "k", Seq("c"), 4L)
      .select("k", "__below_c").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 0L), (2L, 1L), (7L, 2L)), got.toString)
  }
}
