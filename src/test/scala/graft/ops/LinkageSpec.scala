package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("fellegiSunter: hand-computed weights, null agreement counts " +
    "as disagreement, decisions straddle both thresholds") {
    // two fields: name (m=.9, u=.1 -> wa=ln 9=2.197225, wd=ln(.1/.9)
    // = -2.197225) and city (m=.8, u=.2 -> wa=ln 4=1.386294,
    // wd=ln(.2/.8)=-1.386294)
    val pairs = Seq(
      (1L, "ann", "ann", "rome", "rome"),   // both agree: 3.583519
      (2L, "ann", "bob", "rome", "rome"),   // name dis: -0.810931
      (3L, "ann", "ann", "rome", "oslo"),   // city dis:  0.810931
      (4L, "ann", "bob", "rome", "oslo"),   // both dis: -3.583519
      (5L, "ann", null, "rome", "rome")     // null name -> disagreement
    ).toDF("id", "a_name", "b_name", "a_city", "b_city")
    val out = Linkage.fellegiSunter(pairs, Seq(
        Linkage.LinkField("name", col("a_name") === col("b_name"),
          m = 0.9, u = 0.1),
        Linkage.LinkField("city", col("a_city") === col("b_city"),
          m = 0.8, u = 0.2)),
        lower = -1.0, upper = 2.0)
      .select("id", "name_agree", "city_agree", "score", "decision")
      .as[(Long, Boolean, Boolean, Double, String)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(1L) == ((true, true, 3.583519, "match")))
    assert(out(2L) == ((false, true, -0.810931, "review")))
    assert(out(3L) == ((true, false, 0.810931, "review")))
    assert(out(4L) == ((false, false, -3.583519, "non_match")))
    assert(out(5L) == ((false, true, -0.810931, "review")),
      s"null must score as disagreement: ${out(5L)}")
  }

  test("blockedPairs: pairs only within a block, null keys never " +
    "pair, maxBucket drops an oversize block WHOLE with an " +
    "observable count") {
    val a = (Seq(("k1", 1L), ("k1", 2L), ("k2", 3L),
      (null.asInstanceOf[String], 4L)) ++
      (100L to 199L).map(i => ("hot", i))).toDF("blk", "a_id0")
      .select(col("blk"), col("a_id0").as("id"))
    val b = (Seq(("k1", 10L), ("k2", 20L), ("k2", 21L),
      (null.asInstanceOf[String], 40L)) ++
      (200L to 299L).map(i => ("hot", i))).toDF("blk", "b_id0")
      .select(col("blk"), col("b_id0").as("id"))
    // uncapped: k1 -> 2x1, k2 -> 1x2, hot -> 100x100, nulls never
    val un = Linkage.blockedPairs(a, b, col("a_blk"), col("b_blk"))
    assert(un.count() == 2 + 2 + 10000)
    // AQE off to read observedMetrics (the funnel-cap pin)
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqeWas = spark.conf.get(aqeKey)
    try {
      spark.conf.set(aqeKey, "false")
      // collect and read metrics on the SAME DataFrame (even a
      // .select builds a fresh QueryExecution whose metrics stay
      // empty — the funnel-cap pin)
      val capped = Linkage.blockedPairs(a, b, col("a_blk"),
        col("b_blk"), maxBucket = Some(100L)).select("a_id", "b_id")
      val rows = capped.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((1L, 10L), (2L, 10L), (3L, 20L), (3L, 21L)),
        rows.toString)
      val dropped = capped.queryExecution.observedMetrics
        .get("linkage_dropped_blocks").map(_.getLong(0))
      assert(dropped.contains(1L), s"dropped=$dropped")
    } finally spark.conf.set(aqeKey, aqeWas)
  }

  test("entityClusters: transitive matches collapse to one entity id " +
    "(min encoded node), same-key records on opposite files stay " +
    "DISTINCT nodes, unmatched records are absent") {
    import spark.implicits._
    // A1-B1, A2-B1 (transitive via B1), A3-B3; key 1 exists on BOTH
    // files and must encode to different nodes (2 vs 3)
    val matches = Seq((1L, 1L), (2L, 1L), (3L, 3L))
      .toDF("a_key", "b_key")
    val got = Linkage.entityClusters(matches, "a_key", "b_key",
        "clean", "dirty")
      .as[(String, Long, Long)].collect().toSet
    // entity of {A1,A2,B1} = min(2,4,3) = 2; of {A3,B3} = min(6,7) = 6
    assert(got == Set(("clean", 1L, 2L), ("clean", 2L, 2L),
      ("dirty", 1L, 2L), ("clean", 3L, 6L), ("dirty", 3L, 6L)),
      got.toString)
  }

  test("editDistanceJoin: banded levenshtein within blocks only; the " +
    "length filter and the -1 threshold sentinel both prune; " +
    "distances are exact") {
    import spark.implicits._
    val a = Seq((1L, "blk1", "kitten"), (2L, "blk1", "sitten"),
      (3L, "blk1", "sitting"), (4L, "blk1", "apple"),
      (5L, "blk2", "kitten")).toDF("id", "blk", "name")
    val got = Linkage.editDistanceJoin(a, a, col("a_blk"),
        col("b_blk"), "name", "name", maxDist = 2)
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "edit_dist")
      .as[(Long, Long, Long)].collect().toSet
    // kitten~sitten 1, sitten~sitting 2; kitten~sitting is 3 (the
    // banded DP returns -1 past the threshold) and blk2's kitten
    // never pairs across blocks
    assert(got == Set((1L, 2L, 1L), (2L, 3L, 2L)), got.toString)
  }

  test("blockedPairsMultiPass: a typo inside one pass's key window " +
    "is recovered by the complementary pass; pass-union recall is a " +
    "superset of every single pass; cross-pass dedup is exact") {
    import spark.implicits._
    // ids 12345678: pass 1 blocks on LEADING 4 digits, pass 2 on
    // TRAILING 4. (1,2) differ in digit 2 (leading window) -> only
    // pass 2 co-blocks; (3,4) differ in digit 7 (trailing window) ->
    // only pass 1; (5,6) are identical -> BOTH passes emit the pair
    // (the dedup case)
    val recs = Seq(
      (1L, "12345678"), (2L, "19345678"),
      (3L, "55544333"), (4L, "55544933"),
      (5L, "77777777"), (6L, "77777777")).toDF("id", "code")
    def passes(lead: Boolean, trail: Boolean) = Seq(
      lead -> ((substring(col("a_code"), 1, 4),
                substring(col("b_code"), 1, 4))),
      trail -> ((substring(col("a_code"), 5, 4),
                 substring(col("b_code"), 5, 4)))
    ).collect { case (true, p) => p }
    def pairIds(ps: Seq[(Column, Column)]): Set[(Long, Long)] =
      Linkage.blockedPairsMultiPass(recs, recs, ps)
        .filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val p1 = pairIds(passes(lead = true, trail = false))
    val p2 = pairIds(passes(lead = false, trail = true))
    val both = pairIds(passes(lead = true, trail = true))
    assert(p1 == Set((3L, 4L), (5L, 6L)), p1.toString)
    assert(p2 == Set((1L, 2L), (5L, 6L)), p2.toString)
    assert(both == p1.union(p2), both.toString)
    // dedup exactness: (5,6) appears ONCE despite both passes
    val cnt = Linkage.blockedPairsMultiPass(recs, recs,
        passes(lead = true, trail = true))
      .filter(col("a_id") === 5L && col("b_id") === 6L).count()
    assert(cnt == 1L, s"expected 1 deduped pair row, got $cnt")
  }
}
