package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("countMinSketch: bounded size, one-sided error, exact when collision-free") {
    val df = (1 to 1000).map(i => i.toLong % 50).toDF("k")
    val sk = Sketches.countMinSketch(df, "k", depth = 4, width = 1024)
    assert(sk.count() <= 4 * 1024)
    // 50 distinct keys in width 1024 under 4 independent rows: estimates
    // must never undercount, and the top-k min-over-rows is exact here
    val top = Sketches.countMinTopK(df, "k", k = 50).collect()
    assert(top.forall(r => r.getLong(1) >= r.getLong(2)))
    assert(top.forall(r => r.getLong(3) >= 0L))
  }

  test("countMinTopK: estimate >= exact and top key ordering under a hot key") {
    val df = ((1 to 900).map(_ => 7L) ++ (1 to 100).map(i => i.toLong + 100))
      .toDF("k")
    val top = Sketches.countMinTopK(df, "k", k = 5).collect()
    assert(top.head.getLong(0) == 7L && top.head.getLong(2) == 900L)
    assert(top.forall(r => r.getLong(1) >= r.getLong(2)))
  }

  test("countMinSketch is MERGEABLE: union of shard sketches == whole-corpus sketch") {
    val a = (1 to 400).map(i => i.toLong % 37).toDF("k")
    val b = (1 to 600).map(i => i.toLong % 53).toDF("k")
    val whole = Sketches.countMinSketch(a.union(b), "k")
      .as[(Int, Long, Long)].collect().toSet
    val merged = Sketches.countMinSketch(a, "k")
      .union(Sketches.countMinSketch(b, "k"))
      .groupBy("row", "bucket").agg(sum("cnt").cast("long").as("cnt"))
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("skewReport: exact Gini/percentiles on a hand-computed distribution") {
    // keys: 1 row x4 keys, 6 rows x1 key -> counts sorted [1,1,1,1,6]
    // n=5, sum=10, gnum = sum((2r-n-1)c) = (2-6)+(4-6)+(6-6)+(8-6)+(12-6)*6...
    // terms: r=1:(2-6)*1=-4, r=2:-2, r=3:0, r=4:+2, r=5:(10-6)*6=24 -> 20
    // gini = 20/(5*10) = 0.4
    val df = (Seq.fill(6)(99L) ++ Seq(1L, 2L, 3L, 4L)).toDF("k")
    val r = Scale.skewReport(df, "k").collect().head
    assert(r.getLong(0) == 5L)       // n_keys
    assert(r.getLong(1) == 10L)      // n_rows
    assert(r.getLong(2) == 6L)       // max_key_rows
    assert(r.getDouble(3) == 1.0)    // p50
    assert(r.getDouble(5) == 0.6)    // top_key_share
    assert(r.getDouble(6) == 0.4)    // gini
  }

  test("histQuantile: estimate within err_bound of the exact " +
    "percentile; hand-computed interpolation") {
    // 100 values 0..99, width 10 -> buckets 0..9 with 10 each
    val df = (0 until 100).map(_.toDouble).toDF("v")
    val got = Sketches.histQuantile(df, "v", width = 10.0,
        probs = Seq(0.5, 0.9))
      .collect().map(r => r.getDouble(0) ->
        ((r.getDouble(1), r.getDouble(2)))).toMap
    // p=0.5: target 50, bucket 4 (cum 50), est = 40 + 10*(50-40)/10 = 50
    assert(got(0.5) == ((50.0, 10.0)), got.toString)
    // p=0.9: target 90, bucket 8 (cum 90), est = 80 + 10*(90-80)/10 = 90
    assert(got(0.9) == ((90.0, 10.0)))
    // exact percentile of 0..99 at p=0.5 is 49.5 -> |50-49.5| <= 10
    assert(math.abs(got(0.5)._1 - 49.5) <= got(0.5)._2)
  }

  test("histQuantile histograms are MERGEABLE: shard histograms " +
    "summed == whole-corpus histogram drives identical estimates") {
    val a = (0 until 50).map(_.toDouble).toDF("v")
    val b = (50 until 100).map(_.toDouble).toDF("v")
    val whole = Sketches.histQuantile(a.union(b), "v", 7.0, Seq(0.75))
      .collect().head.getDouble(1)
    // merging = just unioning rows before the bucket agg (the bucket
    // agg IS the merge); estimate must match
    val merged = Sketches.histQuantile(b.union(a), "v", 7.0, Seq(0.75))
      .collect().head.getDouble(1)
    assert(whole == merged)
  }

  test("skewReport: uniform keys have Gini 0") {
    val df = (1 to 100).map(i => (i % 10).toLong).toDF("k")
    val r = Scale.skewReport(df, "k").collect().head
    assert(r.getDouble(6) == 0.0)
    assert(r.getLong(2) == 10L)
  }

  test("hllDistinct: scalar replication of the mixer/registers; " +
    "estimate within 4 sigma on 1000 keys; duplicates don't move " +
    "the sketch; tiny sets take the linear-counting branch") {
    import spark.implicits._
    val keys = (1L to 1000L)
    val df = (keys ++ keys ++ keys).toDF("k") // 3x duplicated
    val row = Sketches.hllDistinct(df, "k").collect().head
    val (m, hit, est, exact) =
      (row.getLong(0), row.getLong(1), row.getDouble(2), row.getLong(3))
    assert(m == 64L && exact == 1000L)
    // scalar replication of the register construction
    def mix(x: Long): Long = {
      val a = (x % 2147483648L) * 2654435761L
      val b = a ^ (a >>> 31)
      val c = (b & 2147483647L) * 2654435761L
      c ^ (c >>> 31)
    }
    def rho(r: Long): Int =
      if (r == 0) 57 else java.lang.Long.bitCount((r & -r) - 1) + 1
    val regs = keys.map(mix).groupBy(_ & 63L)
      .map { case (_, ws) => ws.map(w => rho(w >> 6)).max }
    assert(hit == regs.size.toLong, s"hit $hit vs ${regs.size}")
    // duplicates must not change registers (same row from 1x data)
    val one = Sketches.hllDistinct(keys.toDF("k"), "k").collect().head
    assert(one.getLong(1) == hit && one.getDouble(2) == est)
    // 4 sigma at m=64: 4 * 1.04/8 = 52%
    assert(math.abs(est - 1000.0) / 1000.0 < 0.52, s"estimate $est")
    // tiny set: linear counting (V > 0, E small) lands near-exact
    val tiny = Sketches.hllDistinct((1L to 5L).toDF("k"), "k")
      .collect().head
    assert(tiny.getLong(1) <= 5L && tiny.getDouble(2) < 20.0,
      tiny.toString)
  }

  test("kmvDistinct: scalar replication of the folded hash and " +
    "threshold; exact below k; estimate within 4 sigma at k=64 on " +
    "5000 keys; duplicates don't move the sketch") {
    import spark.implicits._
    def mix(x: Long): Long = {
      val a = (((x % 2147483648L) + 2147483648L) % 2147483648L) *
        2654435761L
      val b = a ^ (a >>> 31)
      val c = (b & 2147483647L) * 2654435761L
      val w = c ^ (c >>> 31)
      (((w % 2147483648L) + 2147483648L) % 2147483648L) + 1L
    }
    // below k: sketch IS the distinct set, estimate exact
    val small = Seq(1L, 2L, 3L, 2L, 1L).toDF("k")
    val s = Sketches.kmvDistinct(small, "k", k = 16).collect().head
    assert(s.getLong(1) == 3L && s.getDouble(3) == 3.0 &&
      s.getLong(4) == 3L && s.getDouble(5) == 0.0, s.toString)
    assert(s.getLong(2) == Seq(1L, 2L, 3L).map(mix).max ||
      s.getLong(2) == Seq(1L, 2L, 3L).map(mix).sorted.last, s.toString)
    // at k=64 over 5000 distinct: threshold replicates the scalar
    // 64th-smallest hash; 4 sigma = 4/sqrt(62) = 51%
    val keys = (1L to 5000L)
    val df = (keys ++ keys).toDF("k")
    val row = Sketches.kmvDistinct(df, "k", k = 64).collect().head
    val scalarThr = keys.map(mix).toSet.toSeq.sorted.apply(63)
    assert(row.getLong(2) == scalarThr,
      s"threshold ${row.getLong(2)} vs scalar $scalarThr")
    val est = row.getDouble(3)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.51, s"estimate $est")
    val once = Sketches.kmvDistinct(keys.toDF("k"), "k", k = 64)
      .collect().head
    assert(once.getLong(2) == row.getLong(2) &&
      once.getDouble(3) == est, "duplicates moved the sketch")
  }

  test("kmvOverlap: identical inputs give jaccard 1 and est_int == " +
    "est_union; disjoint hash sets give jaccard 0; half-overlap " +
    "lands near 1/3") {
    import spark.implicits._
    val a = (1L to 2000L).toDF("k")
    val same = Sketches.kmvOverlap(a, a, "k", k = 64).collect().head
    assert(same.getDouble(4) == 1.0, same.toString)
    assert(same.getDouble(5) == same.getDouble(3), same.toString)
    assert(same.getLong(6) == 2000L, same.toString)
    val b = (2001L to 4000L).toDF("k")
    val disj = Sketches.kmvOverlap(a, b, "k", k = 64).collect().head
    // disjoint keys: common hashes only by rare collision
    assert(disj.getDouble(4) <= 0.05, disj.toString)
    assert(disj.getLong(6) == 0L, disj.toString)
    // A = 1..2000, B = 1001..3000: jaccard = 1000/3000 = 1/3
    val c = (1001L to 3000L).toDF("k")
    val half = Sketches.kmvOverlap(a, c, "k", k = 256).collect().head
    val j = half.getDouble(4)
    assert(j > 0.15 && j < 0.55, s"jaccard $j not near 1/3")
    assert(half.getLong(6) == 1000L, half.toString)
    // withExact = false: estimates identical, audit column NULL, and
    // the plan loses the corpus-sized distinct-key join
    val noEx = Sketches.kmvOverlap(a, c, "k", k = 256,
      withExact = false).collect().head
    assert(noEx.isNullAt(6), noEx.toString)
    assert(noEx.getDouble(4) == j, noEx.toString)
  }
}
