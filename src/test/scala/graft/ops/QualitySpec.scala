package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("missingness: per-column null counts and percentages") {
    val df = Seq(
      (Some("a"), Some(1.0)), (None, Some(2.0)),
      (None, None), (Some("d"), Some(4.0))
    ).toDF("s", "v")
    val m = Quality.missingness(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(m("s") == ((2L, 50.0)))
    assert(m("v") == ((1L, 25.0)))
  }

  test("duplicates: n - countDistinct per column") {
    val df = Seq(("a", 1), ("a", 2), ("b", 2)).toDF("s", "v")
    val m = Quality.duplicates(df).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("s") == 1L && m("v") == 1L)
  }

  test("summaryStats: exact min/max/mean/count per group") {
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("h", 10.0))
      .toDF("grp", "v")
    val m = Quality.summaryStats(df, "v", Seq("grp")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(m("g") == ((3L, 1.0, 3.0, 2.0)))
    assert(m("h") == ((1L, 10.0, 10.0, 10.0)))
  }

  test("outOfRange counts rows outside bounds per group") {
    val df = Seq(("g", 50.0), ("g", 150.0), ("g", -1.0)).toDF("grp", "v")
    val r = Quality.outOfRange(df, "v", 0, 100, Seq("grp")).collect()(0)
    assert(r.getLong(1) == 2L && r.getLong(2) == 3L)
  }

  test("histogram: fixed-width bins, nulls excluded, edges exact") {
    val df = Seq(Some(0.0), Some(9.99), Some(10.0), Some(25.0), None)
      .toDF("v")
    val m = Quality.histogram(df, "v", 10.0).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // [0,10): two values; [10,20): the exact edge 10.0; [20,30): one
    assert(m(0L) == ((2L, 0.0, 10.0)))
    assert(m(1L) == ((1L, 10.0, 20.0)))
    assert(m(2L) == ((1L, 20.0, 30.0)))
    assert(m.size == 3) // null row contributed nothing
  }

  test("boxStats: exact quartiles, 1.5-IQR whiskers") {
    val df = (1 to 9).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val r = Quality.boxStats(df, "v", Seq("grp")).collect()(0)
    // 1..9: q1=3, median=5, q3=7, iqr=4 -> whiskers -3 and 13
    assert(r.getLong(1) == 9L)
    assert(r.getDouble(3) == 3.0 && r.getDouble(4) == 5.0 &&
      r.getDouble(5) == 7.0)
    assert(r.getDouble(7) == -3.0 && r.getDouble(8) == 13.0)
  }

  test("distinctSketches: estimate within HLL error of exact; union of " +
       "slice sketches == whole-corpus sketch estimate") {
    // 8000 rows, 2000 distinct values, sliced into 4 groups
    val df = (0 until 8000)
      .map(i => (s"g${i % 4}", (i % 2000).toLong)).toDF("g", "v")
    val sk = Quality.distinctSketches(df, Seq("g"), "v")
    assert(sk.count() == 4)
    // rollup over the slices vs a sketch built over the whole corpus
    val viaUnion = Quality.unionSketchEstimate(sk, Nil)
      .select("approx_distinct", "n_rows").as[(Long, Long)].head()
    val direct = Quality.unionSketchEstimate(
        Quality.distinctSketches(df.selectExpr("'all' AS g", "v"), Seq("g"),
          "v"), Nil)
      .select("approx_distinct").as[Long].head()
    assert(viaUnion._2 == 8000L)
    assert(viaUnion._1 == direct,
      "sketch union must be lossless vs a directly-built sketch")
    // accuracy: HLL at default lgConfigK is ~1.6% rse; allow 5%
    assert(math.abs(viaUnion._1 - 2000L) <= 100,
      s"estimate ${viaUnion._1} not within 5% of 2000")
  }

  test("robustOutliers: median/MAD, modified z-score count, zero-MAD " +
       "group reports none") {
    // group g: median 5.5; devs from it have median (MAD) 2.5;
    // only 1000 (dev 994.5) passes 0.6745*dev > 3.5*2.5
    val g = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 1000.0)
      .map(("g", _))
    // group h: >half identical -> MAD 0 -> no outliers by convention
    val h = Seq(5.0, 5.0, 5.0, 99.0).map(("h", _))
    val out = Quality.robustOutliers((g ++ h).toDF("grp", "v"), "v",
        Seq("grp"))
      .select("grp", "med", "mad", "n", "n_outliers")
      .as[(String, Double, Double, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out("g") == ((5.5, 2.5, 10L, 1L)))
    assert(out("h") == ((5.0, 0.0, 4L, 0L)))
  }

  test("winsorize: clamps to per-group exact percentile bounds") {
    // group g: 1..21 -> p10 = 3.0, p90 = 19.0 (exact interpolation on
    // 21 points lands on integers); group h is untouched by g's bounds
    val df = ((1 to 21).map(i => ("g", i.toDouble)) :+ ("h", 100.0) :+
      ("h", 200.0)).toDF("grp", "v")
    val out = Quality.winsorize(df, "v", Seq("grp"), 0.10, 0.90)
    val g = out.filter("grp = 'g'").select("winsorized")
      .as[Double].collect().sorted
    assert(g.head == 3.0 && g.last == 19.0)
    assert(g.count(_ == 3.0) == 3 && g.count(_ == 19.0) == 3) // 1,2,3 / 19,20,21
    val h = out.filter("grp = 'h'").select("winsorized")
      .as[Double].collect().sorted
    assert(h.toSeq == Seq(110.0, 190.0)) // p10/p90 of {100,200} interpolate
  }

  test("corrPairs: exact ±1 on linear columns, null on zero variance, " +
    "pairwise-complete n") {
    val df = Seq(
      (1.0, Some(2.0), -1.0, 5.0),
      (2.0, Some(4.0), -2.0, 5.0),
      (3.0, None, -3.0, 5.0),
      (4.0, Some(8.0), -4.0, 5.0)
    ).toDF("a", "b", "c", "k")
    val m = Quality.corrPairs(df, Seq("a", "b", "c", "k")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))
      .toMap
    assert(m(("a", "b")) == ((3L, Some(1.0))))   // b = 2a where present
    assert(m(("a", "c")) == ((4L, Some(-1.0))))  // c = -a
    assert(m(("a", "k")) == ((4L, None)))        // k constant -> null
    assert(m(("b", "c")) == ((3L, Some(-1.0))))
  }

  test("expectations: each check type passes and fails on a " +
    "hand-computed fixture; one row per expectation") {
    val df = Seq(
      (1L, Some(5.0), "a"),
      (2L, Some(50.0), "b"),
      (2L, None, "a"),          // dup key + null value
      (3L, Some(500.0), "zzz")  // out of range + out of set
    ).toDF("id", "v", "cat")
    val out = Quality.expectations(df, Seq(
      Quality.ExpectNotNull("v", 80.0),          // 75% -> fail
      Quality.ExpectNotNull("cat", 100.0),       // 100% -> pass
      Quality.ExpectUniqueKey(Seq("id")),        // 1 dup -> fail
      Quality.ExpectUniqueKey(Seq("id", "cat")), // unique -> pass
      Quality.ExpectInRange("v", 0, 100, 50.0),  // 50% -> pass (>=)
      Quality.ExpectInSet("cat", Seq("a", "b"), 80.0), // 75% -> fail
      Quality.ExpectMinRows(4),                  // pass
      Quality.ExpectMinRows(5)                   // fail
    )).collect().map(r => (r.getString(0), r.getString(1)) ->
      (r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(out(("not_null_pct", "v")) == ((75.0, 80.0, false)))
    assert(out(("not_null_pct", "cat")) == ((100.0, 100.0, true)))
    assert(out(("unique_key", "id")) == ((1.0, 0.0, false)))
    assert(out(("unique_key", "id,cat")) == ((0.0, 0.0, true)))
    assert(out(("in_range_pct", "v in [0.0,100.0]")) ==
      ((50.0, 50.0, true)))
    assert(out(("in_set_pct", "cat in {a,b}")) == ((75.0, 80.0, false)))
    assert(out(("min_rows", "")) == ((4.0, 5.0, false)) ||
      out.size == 8) // two min_rows rows share the key-less target
    val minRows = Quality.expectations(df,
      Seq(Quality.ExpectMinRows(4), Quality.ExpectMinRows(5)))
      .collect().map(r => (r.getDouble(3), r.getBoolean(4))).toSet
    assert(minRows == Set((4.0, true), (5.0, false)))
  }

  test("TopKByValue aggregate == window row_number twin; ties total-" +
    "ordered; k > group size; null values skipped; merge across " +
    "partitions") {
    import graft.functions.NativeExpressions
    val df = Seq(
      (1L, "a", Some(5.0)), (2L, "a", Some(9.0)), (3L, "a", Some(9.0)),
      (4L, "a", Some(1.0)), (5L, "a", None),
      (6L, "b", Some(2.0))   // group smaller than k
    ).toDF("id", "g", "v").repartition(7) // force partial merges
    def viaAgg(k: Int) =
      df.groupBy(col("g"))
        .agg(NativeExpressions.top_k_by_value(col("id"), col("v"), k)
          .as("top"))
        .select(col("g"), posexplode(col("top")))
        .select(col("g"), (col("pos") + 1).as("rank"), col("col.id"),
          col("col.value"))
        .as[(String, Int, Long, Double)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
      .orderBy(col("v").desc, col("id"))
    def viaWindow(k: Int) =
      df.filter(col("v").isNotNull)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("g"), col("rank"), col("id"), col("v"))
        .as[(String, Int, Long, Double)].collect().toSet
    assert(viaAgg(3) == viaWindow(3))
    assert(viaAgg(3) == Set(("a", 1, 2L, 9.0), ("a", 2, 3L, 9.0),
      ("a", 3, 1L, 5.0), ("b", 1, 6L, 2.0)))
    assert(viaAgg(10) == viaWindow(10)) // k larger than any group
  }

  test("olsFit: hand-computed slope/intercept/r2; degenerate x -> null") {
    val df = Seq(
      ("g", 1.0, 3.0), ("g", 2.0, 5.0), ("g", 3.0, 7.0),   // y = 2x+1
      ("h", 4.0, 1.0), ("h", 4.0, 9.0)                      // x constant
    ).toDF("grp", "x", "y")
    val m = Quality.olsFit(df, Seq("grp"), "x", "y").collect()
      .map(r => r.getString(0) -> (r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(m("g") == ((3L, Some(2.0), Some(1.0), Some(1.0))))
    assert(m("h") == ((2L, None, None, None)))
  }

  test("missingDays: per-key calendar holes inside each key's own " +
    "span; single-day keys and dense keys emit nothing") {
    def t(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    val df = Seq(
      (1L, t(1)), (1L, t(2)), (1L, t(5)),  // holes: 3rd, 4th
      (2L, t(10)),                          // single day: no span holes
      (3L, t(20)), (3L, t(21))              // dense: nothing missing
    ).toDF("user_id", "ts")
    val got = Quality.missingDays(df, Seq("user_id"), "ts")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "2024-01-03"), (1L, "2024-01-04")),
      got.toString)
  }

  test("psi: identical distributions score ~0; a shifted current " +
    "sample alarms; empty current bins contribute via the guard") {
    val ref = (1 to 100).map(_.toDouble).toDF("v")
    // identical: every term ~0 (only the 0.5 guard perturbs shares)
    val same = Quality.psi(ref, (1 to 100).map(_.toDouble).toDF("v"),
        "v", bins = 4)
      .agg(sum(col("psi_term"))).collect().head.getDouble(0)
    assert(math.abs(same) < 1e-6, same.toString)
    // hard shift: current all in the top reference bin
    val shifted = Quality.psi(ref,
        (101 to 200).map(_.toDouble).toDF("v"), "v", bins = 4)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(5)))).toMap
    // bins 1-3: cur_n 0 but a FINITE positive term via the guard
    // (PSI terms are always >= 0: (q-p) and ln(q/p) share sign)
    assert(shifted(1)._2 == 0L && shifted(1)._3 > 0 &&
      !shifted(1)._3.isInfinite, shifted.toString)
    // bin 4 holds all 100 current rows, large positive term
    assert(shifted(4)._2 == 100L && shifted(4)._3 > 0.5)
    val total = shifted.values.map(_._3).sum
    assert(total > 0.25, s"shifted PSI must alarm: $total")
  }

  test("woeBins: hand-computed WOE/IV on a 2-bin separable feature") {
    // values 1..10, bad = v > 5; 2 bins split at the median boundary
    val df = (1 to 10).map(i => (i.toDouble, i > 5)).toDF("v", "bad")
    val got = Quality.woeBins(df, "v", col("bad"), bins = 2)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // median boundary 5.5 -> bin1 = {1..5} all good, bin2 = {6..10}
    // all bad; totals tb=5 tg=5
    // bin1: woe = ln((0.5/5)/(5.5/5)) = ln(1/11) = -2.397895
    // bin2: woe = ln((5.5/5)/(0.5/5)) = ln(11) = 2.397895
    assert(got(1) == ((5L, 0L, 0.0, -2.397895)), got.toString)
    assert(got(2) == ((5L, 5L, 1.0, 2.397895)), got.toString)
    // IV terms: (0/5 - 5/5)*(-2.397895) = 2.397895 each
    val iv = Quality.woeBins(df, "v", col("bad"), bins = 2)
      .agg(org.apache.spark.sql.functions.sum(col("iv_term")))
      .collect().head.getDouble(0)
    assert(math.abs(iv - 2 * 2.397895) < 1e-9, iv.toString)
  }

  test("chiSquareIndependence: hand-computed 2x2 cells, exact-decimal " +
    "suite statistic, dof, null categories excluded") {
    import spark.implicits._
    val rows =
      Seq.fill(10)(("x", "p")) ++ Seq.fill(20)(("x", "q")) ++
      Seq.fill(20)(("y", "p")) ++ Seq.fill(10)(("y", "q")) ++
      Seq((null.asInstanceOf[String], "p"), ("x", null.asInstanceOf[String]))
    val got = Quality.chiSquareIndependence(
        rows.toDF("a", "b"), "a", "b")
      .orderBy("a", "b")
      .as[(String, String, Long, Double, Double, Double, Int)]
      .collect().toSeq
    // marginals 30/30 each, tot 60 -> every expected = 15;
    // contribs: (10-15)^2/15 = (20-15)^2/15 = 1.666667 (r6);
    // chi2 = 4 * 1.666667 summed exactly = 6.666668; dof = 1
    assert(got == Seq(
      ("x", "p", 10L, 15.0, 1.666667, 6.666668, 1),
      ("x", "q", 20L, 15.0, 1.666667, 6.666668, 1),
      ("y", "p", 20L, 15.0, 1.666667, 6.666668, 1),
      ("y", "q", 10L, 15.0, 1.666667, 6.666668, 1)), got.toString)
  }

  test("cramersV: hand value on the chiSquare 2x2 fixture; perfect " +
    "association scores 1; a constant column nulls V") {
    import spark.implicits._
    // the chiSquareIndependence fixture: chi2 = 6.666668, n = 60,
    // min dim = 1 -> V = sqrt(6.666668/60) = 0.333333
    val rows =
      Seq.fill(10)(("x", "p")) ++ Seq.fill(20)(("x", "q")) ++
      Seq.fill(20)(("y", "p")) ++ Seq.fill(10)(("y", "q"))
    val got = Quality.cramersV(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Double, Int, Option[Double])].collect().head
    assert(got == ((60L, 6.666668, 1, Some(0.333333))), got.toString)
    // perfect association: V = 1
    val perfect = Seq.fill(5)(("x", "p")) ++ Seq.fill(5)(("y", "q"))
    val v1 = Quality.cramersV(perfect.toDF("a", "b"), "a", "b")
      .as[(Long, Double, Int, Option[Double])].collect().head
    assert(v1._4.contains(1.0), v1.toString)
    // constant a: min dim 0 -> V undefined
    val const = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    val v0 = Quality.cramersV(const, "a", "b")
      .as[(Long, Double, Int, Option[Double])].collect().head
    assert(v0._4.isEmpty, v0.toString)
  }

  test("cupedAdjustment: hand theta/raw/adjusted/variance-reduction " +
    "on a 4-unit fixture; constant pre nulls the adjustment but " +
    "keeps the raw diff") {
    import spark.implicits._
    val df = Seq((1.0, 3.0, true), (3.0, 5.0, true),
      (2.0, 3.0, false), (4.0, 5.0, false)).toDF("pre", "post", "t")
    val got = Quality.cupedAdjustment(df, "pre", "post", col("t"))
      .as[(Long, Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].collect().head
    // theta = 16/20, raw = 4-4 = 0, adj = 0 - 0.8*(2-3) = 0.8,
    // reduction = corr^2 = 0.8
    assert(got == ((2L, 2L, Some(0.8), Some(0.0), Some(0.8),
      Some(0.8))), got.toString)
    val flatPre = Seq((5.0, 3.0, true), (5.0, 7.0, false))
      .toDF("pre", "post", "t")
    val g2 = Quality.cupedAdjustment(flatPre, "pre", "post", col("t"))
      .as[(Long, Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].collect().head
    assert(g2._3.isEmpty && g2._4.contains(-4.0) && g2._5.isEmpty &&
      g2._6.isEmpty, g2.toString)
  }

  test("bootstrapMeanCi: scalar replication of the Poisson-weight " +
    "replicas on a tiny fixture; constant values collapse the " +
    "interval; bounds bracket the mean") {
    import spark.implicits._
    val rows = (1L to 10L).map(i => (i, i.toDouble))
    val got = Quality.bootstrapMeanCi(rows.toDF("id", "v"), "v", "id",
        replicas = 20, alphaMicros = 100000L)
      .as[(Long, Option[Long], Long, Long, Option[Long], Option[Long])]
      .collect().head
    // scalar model: same mixer chain, same cutoffs, same truncating
    // replica means, same ceil-k order statistics
    val cuts = Seq(790015083L, 1580030167L, 1975037709L, 2106706890L,
      2139624185L, 2146207644L, 2147304887L, 2147461637L)
    def ph(id: Long): Long =
      ((id % 2147483647L) * 2654435761L) % 2147483647L
    val means = (1 to 20).flatMap { b =>
      val ws = rows.map { case (id, v) =>
        val h = (ph(id) + b * 2654435761L) % 2147483647L
        val w = cuts.indexWhere(h < _) match {
          case -1 => 8L; case k => k.toLong
        }
        (w, (v * 1e6).toLong)
      }
      val (wn, wsum) = (ws.map(_._1).sum, ws.map(t => t._1 * t._2).sum)
      if (wn == 0) None else Some(wsum / wn)
    }.sorted
    val bu = means.length
    val klo = math.max(1, (bu * 100000L + 999999) / 1000000).toInt
    val khi = ((bu * 900000L + 999999) / 1000000).toInt
    assert(got._1 == 10L && got._2.contains(5500000L), got.toString)
    assert(got._4 == bu.toLong, got.toString)
    assert(got._5.contains(means(klo - 1)), s"$got vs lo ${means(klo - 1)}")
    assert(got._6.contains(means(khi - 1)), s"$got vs hi ${means(khi - 1)}")
    assert(got._5.get <= 5500000L && got._6.get >= 5500000L, got.toString)
    // constant values: every weighted mean is the value itself
    val const = (1L to 50L).map(i => (i, 7.0)).toDF("id", "v")
    val c = Quality.bootstrapMeanCi(const, "v", "id", replicas = 10)
      .as[(Long, Option[Long], Long, Long, Option[Long], Option[Long])]
      .collect().head
    assert(c._5.contains(7000000L) && c._6.contains(7000000L), c.toString)
  }

  test("isotonicCalibration: the closed-form min-max equals hand PAV " +
    "pooling on a violating fixture; a monotone input is unchanged; " +
    "output is monotone") {
    import spark.implicits._
    // raw bin means 0.5, 0.0, 1.0, 0.5 -> PAV pools to
    // 0.25, 0.25, 2/3, 2/3
    val df = Seq((0.1, true), (0.1, false), (0.3, false), (0.3, false),
      (0.6, true), (0.9, true), (0.9, false)).toDF("s", "p")
    val got = Quality.isotonicCalibration(df, "s", col("p"), bins = 4)
      .orderBy("bin")
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0, 2L, 1L, 500000L, 250000L),
      (1, 2L, 0L, 0L, 250000L), (2, 1L, 1L, 1000000L, 666666L),
      (3, 2L, 1L, 500000L, 666666L)), got.toString)
    assert(got.map(_._5) == got.map(_._5).sorted, "not monotone")
    // already-monotone bins: iso == raw everywhere
    val mono = Seq((0.1, false), (0.1, false), (0.4, true),
      (0.4, false), (0.9, true)).toDF("s", "p")
    val g2 = Quality.isotonicCalibration(mono, "s", col("p"), bins = 4)
      .orderBy("bin")
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(g2.forall(r => r._4 == r._5), g2.toString)
  }

  test("randomizationTest: scalar replication of the salted-hash " +
    "null on a tiny fixture; zero observed difference gives p 1; " +
    "a strong signal gives a small p; bit-identical across runs") {
    import spark.implicits._
    // tiny fixture, B = 7: replicate every replica in Scala
    val rows = Seq((1L, 10.0, true), (2L, 20.0, true),
      (3L, 30.0, false), (4L, 40.0, false), (5L, 50.0, true),
      (6L, 60.0, false))
    val df = rows.toDF("id", "v", "a")
    val got = Quality.randomizationTest(df, "v", col("a"), "id",
        replicas = 7)
      .as[(Long, Long, Option[Double], Long, Long, Double)]
      .collect().head
    def ph(id: Long): Long =
      ((id % 2147483647L) * 2654435761L) % 2147483647L
    val (na, nb) = (3L, 3L)
    val mus = rows.map { case (id, v, _) => id -> (v * 1e6).toLong }
    val (sa, sb) = (rows.filter(_._3).map(r => (r._2 * 1e6).toLong).sum,
      rows.filterNot(_._3).map(r => (r._2 * 1e6).toLong).sum)
    val obsNum = BigInt((sa * nb - sb * na).abs)
    val expExtreme = (1 to 7).count { b =>
      val as = mus.map { case (id, mu) =>
        (((ph(id) + b * 2654435761L) % 2147483647L) % (na + nb) < na,
          mu)
      }
      val (rsa, rna) = (as.filter(_._1).map(_._2).sum,
        as.count(_._1).toLong)
      val (rsb, rnb) = (as.filterNot(_._1).map(_._2).sum,
        as.count(!_._1).toLong)
      rna == 0 || rnb == 0 ||
        (BigInt(rsa) * rnb - BigInt(rsb) * rna).abs * na * nb >=
          obsNum * rna * rnb
    }.toLong
    assert(got._1 == na && got._2 == nb, got.toString)
    assert(got._5 == expExtreme,
      s"n_extreme ${got._5} vs scalar $expExtreme")
    assert(got._6 == math.rint((1.0 + expExtreme) / 8.0 * 1e6) / 1e6,
      got.toString)
    // all-equal values: every replica ties the zero observed diff
    val flat = (1L to 10L).map(i => (i, 5.0, i <= 5)).toDF("id", "v", "a")
    val p1 = Quality.randomizationTest(flat, "v", col("a"), "id",
        replicas = 9)
      .as[(Long, Long, Option[Double], Long, Long, Double)]
      .collect().head
    assert(p1._3.contains(0.0) && p1._6 == 1.0, p1.toString)
    // strong signal: 20 hundreds vs 20 zeros, B = 99
    val strong = ((1L to 20L).map(i => (i, 100.0, true)) ++
      (21L to 40L).map(i => (i, 0.0, false))).toDF("id", "v", "a")
    val ps = Quality.randomizationTest(strong, "v", col("a"), "id",
        replicas = 99)
      .as[(Long, Long, Option[Double], Long, Long, Double)]
      .collect().head
    assert(ps._6 <= 0.2, ps.toString)
    assert(ps._3.contains(100.0), ps.toString)
    // determinism: a second run is bit-identical
    val again = Quality.randomizationTest(strong, "v", col("a"), "id",
        replicas = 99)
      .as[(Long, Long, Option[Double], Long, Long, Double)]
      .collect().head
    assert(again == ps, s"$again vs $ps")
  }

  test("groupFairness: hand confusion rates per group; undefined " +
    "rates are null (not 0); dp_gap is vs the overall rate; null " +
    "rows excluded") {
    import spark.implicits._
    val df = Seq(
      ("A", Some(true), Some(true)), ("A", Some(true), Some(false)),
      ("A", Some(false), Some(true)), ("A", Some(false), Some(false)),
      ("B", Some(false), Some(false)), ("B", Some(false), Some(false)),
      ("B", None, Some(true)), ("B", Some(true), None))
      .toDF("g", "y", "h")
    val got = Quality.groupFairness(df, "g", col("y"), col("h"))
      .as[(String, Long, Long, Long, Long, Long, Option[Double],
        Option[Double], Option[Double], Option[Double],
        Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    // overall selection = 2/6; A: one of each cell
    assert(got("A") == (("A", 4L, 1L, 1L, 1L, 1L, Some(0.5),
      Some(0.5), Some(0.5), Some(0.5), Some(0.166667))),
      got("A").toString)
    // B: no actual/predicted positives -> tpr and ppv UNDEFINED
    assert(got("B") == (("B", 2L, 0L, 0L, 0L, 2L, Some(0.0),
      None, Some(0.0), None, Some(-0.333333))), got("B").toString)
  }

  test("averagePrecision: hand value 0.833333 on the 3-row fixture; " +
    "perfect ranking 1; all-tied scores = prevalence; no negatives 1; " +
    "no positives null; tiny buckets agree") {
    import spark.implicits._
    val df = Seq((0.9, true), (0.8, false), (0.7, true)).toDF("s", "p")
    val got = Quality.averagePrecision(df, "s", col("p"))
      .as[(Long, Long, Option[Double])].collect().head
    assert(got == ((2L, 1L, Some(0.833333))), got.toString)
    val perfect = Seq((0.9, true), (0.8, true), (0.1, false))
      .toDF("s", "p")
    assert(Quality.averagePrecision(perfect, "s", col("p"))
      .as[(Long, Long, Option[Double])].collect().head._3
      .contains(1.0))
    val tied = Seq((0.5, true), (0.5, false), (0.5, false))
      .toDF("s", "p")
    assert(Quality.averagePrecision(tied, "s", col("p"))
      .as[(Long, Long, Option[Double])].collect().head._3
      .contains(0.333333))
    val allPos = Seq((0.3, true), (0.7, true)).toDF("s", "p")
    assert(Quality.averagePrecision(allPos, "s", col("p"))
      .as[(Long, Long, Option[Double])].collect().head ==
      ((2L, 0L, Some(1.0))))
    val noPos = Seq((0.3, false), (0.7, false)).toDF("s", "p")
    assert(Quality.averagePrecision(noPos, "s", col("p"))
      .as[(Long, Long, Option[Double])].collect().head ==
      ((0L, 2L, None)))
    val tiny = Quality.averagePrecision(df, "s", col("p"),
        bucketSize = 2L)
      .as[(Long, Long, Option[Double])].collect().head
    assert(tiny == got, s"tiny-bucket $tiny vs default $got")
  }

  test("conformalThreshold: k = ceil((n+1)(1-alpha)) order statistic " +
    "per group; too-small groups null qhat but report k; tie blocks " +
    "satisfy the cumulative; tiny buckets agree") {
    import spark.implicits._
    val df = ((1 to 10).map(i => ("A", i.toDouble)) ++
      (1 to 3).map(i => ("B", i.toDouble))).toDF("g", "s")
    val got = Quality.conformalThreshold(df, "s", Seq("g"),
        alphaMicros = 100000L)
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // A: k = ceil(11*0.9) = 10 -> the 10th smallest = 10.0
    assert(got("A") == ((10L, 10L, Some(10000000L))), got.toString)
    // B: k = ceil(4*0.9) = 4 > n = 3 -> no valid threshold
    assert(got("B") == ((3L, 4L, None)), got.toString)
    // ties: scores [1,1,1,2], alpha .5 -> k = 3, cum(1) = 3 -> qhat 1
    val ties = Seq(("C", 1.0), ("C", 1.0), ("C", 1.0), ("C", 2.0))
      .toDF("g", "s")
    val t = Quality.conformalThreshold(ties, "s", Seq("g"),
        alphaMicros = 500000L)
      .as[(String, Long, Long, Option[Long])].collect().head
    assert(t == (("C", 4L, 3L, Some(1000000L))), t.toString)
    val tiny = Quality.conformalThreshold(df, "s", Seq("g"),
        alphaMicros = 100000L, bucketSize = 2L)
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(tiny == got, s"tiny-bucket $tiny vs default $got")
  }

  test("spearmanCorr: hand tie fixture 0.948683; perfect monotone " +
    "(nonlinear) 1; reversed -1; constant axis null; tiny buckets " +
    "agree") {
    import spark.implicits._
    // x = [1,2,2,3] (avg ranks 1, 2.5, 2.5, 4), y = [1,2,3,4]:
    // Pearson on doubled ranks = 72/sqrt(72*80) = 0.948683
    val tied = Seq((1.0, 1.0), (2.0, 2.0), (2.0, 3.0), (3.0, 4.0))
      .toDF("x", "y")
    val got = Quality.spearmanCorr(tied, "x", "y")
      .as[(Long, Option[Double])].collect().head
    assert(got == ((4L, Some(0.948683))), got.toString)
    // monotone nonlinear: rho exactly 1 even though Pearson < 1
    val mono = Seq((1.0, 1.0), (2.0, 100.0), (3.0, 100000.0))
      .toDF("x", "y")
    assert(Quality.spearmanCorr(mono, "x", "y")
      .as[(Long, Option[Double])].collect().head._2.contains(1.0))
    val rev = Seq((1.0, 3.0), (2.0, 2.0), (3.0, 1.0)).toDF("x", "y")
    assert(Quality.spearmanCorr(rev, "x", "y")
      .as[(Long, Option[Double])].collect().head._2.contains(-1.0))
    val const = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("x", "y")
    assert(Quality.spearmanCorr(const, "x", "y")
      .as[(Long, Option[Double])].collect().head._2.isEmpty)
    val tiny = Quality.spearmanCorr(tied, "x", "y", bucketSize = 2L)
      .as[(Long, Option[Double])].collect().head
    assert(tiny == got, s"tiny-bucket $tiny vs default $got")
  }

  test("cohenKappa: the textbook 2x2 fixture scores 0.4; perfect " +
    "agreement 1; systematic disagreement -1; disjoint label spaces " +
    "0; constant-equal raters null") {
    import spark.implicits._
    // the classic kappa worked example: 20 yy, 5 yn, 10 ny, 15 nn
    // po = 35/50, pe = (25*30 + 25*20)/2500 -> kappa = 0.4
    val rows =
      Seq.fill(20)(("yes", "yes")) ++ Seq.fill(5)(("yes", "no")) ++
      Seq.fill(10)(("no", "yes")) ++ Seq.fill(15)(("no", "no"))
    val got = Quality.cohenKappa(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Option[Double])].collect().head
    assert(got == ((50L, 35L, Some(0.4))), got.toString)
    val perfect = (Seq.fill(5)(("x", "x")) ++ Seq.fill(5)(("y", "y")))
      .toDF("a", "b")
    assert(Quality.cohenKappa(perfect, "a", "b")
      .as[(Long, Long, Option[Double])].collect().head ==
      ((10L, 10L, Some(1.0))))
    val anti = (Seq.fill(5)(("x", "y")) ++ Seq.fill(5)(("y", "x")))
      .toDF("a", "b")
    assert(Quality.cohenKappa(anti, "a", "b")
      .as[(Long, Long, Option[Double])].collect().head ==
      ((10L, 0L, Some(-1.0))))
    // raters never share a label: S = 0, kappa = A*N/N^2 = 0
    val disjoint = Seq.fill(4)(("x", "y")).toDF("a", "b")
    assert(Quality.cohenKappa(disjoint, "a", "b")
      .as[(Long, Long, Option[Double])].collect().head ==
      ((4L, 0L, Some(0.0))))
    // both raters constant and equal: pe = 1, undefined
    val const = Seq.fill(4)(("x", "x")).toDF("a", "b")
    assert(Quality.cohenKappa(const, "a", "b")
      .as[(Long, Long, Option[Double])].collect().head._3.isEmpty)
  }

  test("ksTwoSample: hand-computed D and location; tiny buckets " +
    "(forcing cross-bucket offsets) agree with the default; " +
    "identical samples give D 0 at the smallest value") {
    import spark.implicits._
    // A = {1,2,3}, B = {2,3,4,4}: D = 1/2 at v = 3
    val df = (Seq(1.0, 2.0, 3.0).map(v => (v, true)) ++
      Seq(2.0, 3.0, 4.0, 4.0).map(v => (v, false)))
      .toDF("v", "a")
    val got = Quality.ksTwoSample(df, "v", col("a"))
      .as[(Long, Long, Double, Double)].collect().head
    assert(got == ((3L, 4L, 0.5, 3.0)), got.toString)
    // bucketSize 2 micro-units: every distinct value its own bucket,
    // the cross-bucket offset frame does ALL the cumulative work
    val tiny = Quality.ksTwoSample(df, "v", col("a"), bucketSize = 2L)
      .as[(Long, Long, Double, Double)].collect().head
    assert(tiny == got, s"hierarchy must be a pure refactoring: $tiny")
    // identical samples: D = 0, argmax ties to the smallest value
    val same = (Seq(5.0, 6.0).map(v => (v, true)) ++
      Seq(5.0, 6.0).map(v => (v, false))).toDF("v", "a")
    val z = Quality.ksTwoSample(same, "v", col("a"))
      .as[(Long, Long, Double, Double)].collect().head
    assert(z == ((2L, 2L, 0.0, 5.0)), z.toString)
  }

  test("ksFromCounts: planted >2^32 per-value counts push the " +
    "cross-multiply past 2^63 - decimal(38,0) arithmetic keeps the " +
    "argmax exact where long silently wraps") {
    import spark.implicits._
    // na = nb = 6e9; at v=1.0 the numerator is
    // |5e9*6e9 - 1e9*6e9| = 2.4e19 > Long.MaxValue (9.22e18):
    // a long product here wraps negative and the argmax picks a
    // garbage row. Expected D replayed below on BigInt.
    val ca = Seq(5000000000L, 1000000000L, 0L)
    val cb = Seq(1000000000L, 1000000000L, 4000000000L)
    val vs = Seq(1.0, 2.0, 3.0)
    val counts = vs.indices.map(i => (vs(i), ca(i), cb(i)))
      .toDF("v", "__ca", "__cb")
      .select(col("v").cast("decimal(18,6)").as("__v"),
        col("__ca"), col("__cb"))
    val na = BigInt(ca.sum); val nb = BigInt(cb.sum)
    val nums = vs.indices.map { i =>
      val pa = BigInt(ca.take(i + 1).sum)
      val pb = BigInt(cb.take(i + 1).sum)
      (pa * nb - pb * na).abs
    }
    assert(nums.max > BigInt(Long.MaxValue), "test must cross 2^63")
    val expD = math.rint(
      (BigDecimal(nums.max) / BigDecimal(na * nb)).toDouble * 1e6) / 1e6
    val got = Quality.ksFromCounts(counts)
      .as[(Long, Long, Double, Double)].collect().head
    assert(got == ((na.toLong, nb.toLong, expD,
      vs(nums.indexOf(nums.max)))), got.toString)
  }

  test("rocAuc: hand-computed Mann-Whitney with ties; perfect " +
    "separation 1.0; all-tied 0.5; single class null; tiny buckets " +
    "agree with the default") {
    import spark.implicits._
    // pos {0.9, 0.8, 0.8}, neg {0.8, 0.1}: U = 5 (two half-ties),
    // AUC = 5/6
    val df = (Seq(0.9, 0.8, 0.8).map((_, true)) ++
      Seq(0.8, 0.1).map((_, false))).toDF("s", "p")
    val got = Quality.rocAuc(df, "s", col("p"))
      .as[(Long, Long, Option[Double])].collect().head
    assert(got == ((3L, 2L, Some(0.833333))), got.toString)
    val tiny = Quality.rocAuc(df, "s", col("p"), bucketSize = 2L)
      .as[(Long, Long, Option[Double])].collect().head
    assert(tiny == got, s"hierarchy must be a pure refactoring: $tiny")
    val perfect = (Seq(0.9, 0.7).map((_, true)) ++
      Seq(0.3, 0.1).map((_, false))).toDF("s", "p")
    assert(Quality.rocAuc(perfect, "s", col("p"))
      .as[(Long, Long, Option[Double])].collect().head ==
      ((2L, 2L, Some(1.0))))
    val allTied = Seq((0.5, true), (0.5, false), (0.5, true))
      .toDF("s", "p")
    assert(Quality.rocAuc(allTied, "s", col("p"))
      .as[(Long, Long, Option[Double])].collect().head ==
      ((2L, 1L, Some(0.5))))
    val oneClass = Seq((0.5, true), (0.7, true)).toDF("s", "p")
    assert(Quality.rocAuc(oneClass, "s", col("p"))
      .as[(Long, Long, Option[Double])].collect().head ==
      ((2L, 0L, None)))
  }

  test("calibrationBins + ECE: hand-computed bins, top edge folds " +
    "into the last bin, out-of-range scores drop, exact truncating " +
    "micro-units, perfectly calibrated input gives ECE 0") {
    import spark.implicits._
    // bin 0: scores .05(T) .15? no — bins=10: [.0,.1) [.1,.2) ...
    val df = Seq((0.05, true), (0.08, false), (0.55, true),
      (0.55, false), (1.0, true), (-0.2, true), (1.5, false))
      .toDF("s", "p")
    val bins = Quality.calibrationBins(df, "s", col("p"))
      .orderBy("bin")
      .as[(Int, Long, Long, Long)].collect().toSeq
    // bin 0: n=2 conf=(50000+80000)/2=65000 acc=500000
    // bin 5: n=2 conf=550000 acc=500000
    // bin 9 (1.0 folds): n=1 conf=1000000 acc=1000000
    assert(bins == Seq((0, 2L, 65000L, 500000L),
      (5, 2L, 550000L, 500000L), (9, 1L, 1000000L, 1000000L)),
      bins.toString)
    val ece = Quality.expectedCalibrationError(df, "s", col("p"))
      .as[(Long, Long)].collect().head
    // dev: |1e6-130000| + |1e6-1100000| + |1e6-1e6| = 870000+100000
    assert(ece == ((5L, 194000L)), ece.toString)
    // a perfectly calibrated score: acc == conf in every bin
    val perfect = Seq((0.0, false), (1.0, true), (0.5, true),
      (0.5, false)).toDF("s", "p")
    val e2 = Quality.expectedCalibrationError(perfect, "s", col("p"))
      .as[(Long, Long)].collect().head
    assert(e2 == ((4L, 0L)), e2.toString)
  }

  test("chiSquareGofByGroup: hand-computed uniform and pooled chi2; " +
    "a group's unobserved bucket is a ZERO cell that still " +
    "contributes") {
    import spark.implicits._
    // g1: 6/3/3 over 3 buckets (n=12, E=4): chi2 = (4+1+1)/4 = 1.5
    // g2: 4/4/0 — bucket c UNOBSERVED for g2 but observed globally:
    // the zero cell contributes (0-8/3)^2/(8/3) = 8/3; chi2 =
    // 2*(4/3)^2/(8/3) + 8/3 = 4 — observed as 4.000001 because the
    // stated contract rounds each CONTRIBUTION to 6 before the
    // decimal sum (0.666667*2 + 2.666667), exactly what the oracle
    // replays
    val df = (Seq.fill(6)(("g1", "a")) ++ Seq.fill(3)(("g1", "b")) ++
      Seq.fill(3)(("g1", "c")) ++ Seq.fill(4)(("g2", "a")) ++
      Seq.fill(4)(("g2", "b"))).toDF("g", "bk")
    val uni = Quality.chiSquareGofByGroup(df, "g", "bk")
      .as[(String, Long, Int, Double)].collect().toSet
    assert(uni == Set(("g1", 12L, 2, 1.5), ("g2", 8L, 2, 4.000001)),
      uni.toString)
    // pooled: expected from the 10/7/3 overall mix
    // g1 E = 6.0/4.2/1.8 -> 0 + (3-4.2)^2/4.2 + (3-1.8)^2/1.8 =
    //   0.342857 + 0.8 = 1.142857; g2 E = 4.0/2.8/1.2 ->
    //   0 + (4-2.8)^2/2.8 + (0-1.2)^2/1.2 = 0.514286 + 1.2 = 1.714286
    val pooled = Quality.chiSquareGofByGroup(df, "g", "bk",
        pooled = true)
      .as[(String, Long, Int, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(math.abs(pooled("g1") - 1.142857) < 1e-6 &&
      math.abs(pooled("g2") - 1.714286) < 1e-6, pooled.toString)
  }

  test("bhFdr: textbook step-up — keeps every p at or below the " +
    "LARGEST rank satisfying p <= k*q/m even when a smaller rank " +
    "fails; all-null-true keeps nothing; tied p share a decision") {
    import spark.implicits._
    // classic: m=5, q=0.25; sorted p = .01, .04, .03 -> (.01,.03,.04),
    // .20, .50: k*q/m = .05,.10,.15,.20,.25 — rank 4 (p=.20) passes,
    // so .20 and everything below it is kept even though nothing
    // above rank 4 matters
    val df = Seq(("a", 0.01), ("b", 0.04), ("c", 0.03), ("d", 0.20),
      ("e", 0.50)).toDF("h", "p")
    val kept = Quality.bhFdr(df, "p", 0.25)
      .select("h").as[String].collect().toSet
    assert(kept == Set("a", "b", "c", "d"), kept.toString)
    // none significant
    val none = Quality.bhFdr(
      Seq(("a", 0.3), ("b", 0.6), ("c", 0.9)).toDF("h", "p"),
      "p", 0.05)
    assert(none.count() == 0)
    // ties: both .02 rows share the decision
    val ties = Quality.bhFdr(
      Seq(("a", 0.02), ("b", 0.02), ("c", 0.9)).toDF("h", "p"),
      "p", 0.1).select("h").as[String].collect().toSet
    assert(ties == Set("a", "b"), ties.toString)
  }

  test("looTargetEncode: peers-only mean excludes the own row; " +
    "singleton is null unsmoothed and shrinks to the global mean " +
    "when smoothed") {
    import spark.implicits._
    val df = Seq((1L, "A", 10.0), (2L, "A", 20.0), (3L, "A", 30.0),
      (4L, "B", 5.0)).toDF("id", "cat", "t")
    val plain = Quality.looTargetEncode(df, "id", "cat", "t")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // A rows: (60 - t) / 2; B singleton: 0/0 -> null
    assert(plain == Map(1L -> Some(25.0), 2L -> Some(20.0),
      3L -> Some(15.0), 4L -> None), plain.toString)
    // smoothing m=2, global mean 65/4 = 16.25:
    // A t=10: (50 + 32.5) / 4 = 20.625 ; B: 32.5 / 2 = 16.25
    val sm = Quality.looTargetEncode(df, "id", "cat", "t",
        smoothing = 2.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(sm(1L) == 20.625 && sm(4L) == 16.25, sm.toString)
  }

  test("mutualInfo: identical columns give MI = H = ln 2 and nmi 1; " +
    "independent columns give MI 0; a constant column nulls nmi") {
    import spark.implicits._
    // perfectly dependent, 2-symbol uniform: MI = H(A) = H(B) = ln 2
    val dep = Seq(("x", "x"), ("x", "x"), ("y", "y"), ("y", "y"))
      .toDF("a", "b")
    val d = Quality.mutualInfo(dep, "a", "b")
      .as[(Long, Long, Double, Double, Double, Option[Double])]
      .collect().head
    assert(d._1 == 4L && d._2 == 2L)
    assert(d._3 == 0.693147 && d._4 == 0.693147 && d._5 == 0.693147, d)
    assert(d._6.contains(1.0), d)
    // independent uniform 2x2: every cell ln(4*1/(2*2)) = ln 1 = 0
    val ind = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .toDF("a", "b")
    val i = Quality.mutualInfo(ind, "a", "b")
      .as[(Long, Long, Double, Double, Double, Option[Double])]
      .collect().head
    assert(i._3 == 0.0 && i._6.contains(0.0), i)
    // constant A: H(A) = 0 -> nmi undefined (null), MI 0
    val const = Seq(("x", "p"), ("x", "q"), ("x", "p")).toDF("a", "b")
    val c = Quality.mutualInfo(const, "a", "b")
      .as[(Long, Long, Double, Double, Double, Option[Double])]
      .collect().head
    assert(c._3 == 0.0 && c._4 == 0.0 && c._6.isEmpty, c)
  }

  test("sequenceGaps: intra-bucket and cross-border holes (incl. a " +
    "whole missing bucket) found exactly once; duplicates collapse; " +
    "minGap filters") {
    import spark.implicits._
    // bucketSize 8: buckets {0:[1,2,3], 1:[10,12], 12:[100]} — the
    // 13..99 hole spans ten fully-missing buckets
    val ids = Seq(1L, 2L, 3L, 10L, 12L, 100L, 12L, 3L).toDF("id")
    val all = Quality.sequenceGaps(ids, "id", minGap = 1L,
        bucketSize = 8L)
      .orderBy("gap_start").as[(Long, Long, Long)].collect().toSeq
    assert(all == Seq((4L, 9L, 6L), (11L, 11L, 1L), (13L, 99L, 87L)),
      all.toString)
    val filtered = Quality.sequenceGaps(ids, "id", minGap = 5L,
        bucketSize = 8L)
      .orderBy("gap_start").as[(Long, Long, Long)].collect().toSeq
    assert(filtered == Seq((4L, 9L, 6L), (13L, 99L, 87L)))
    // dense sequence: the pass certificate is an empty result
    assert(Quality.sequenceGaps((1L to 50L).toDF("id"), "id",
      bucketSize = 8L).isEmpty)
  }

  test("kAnonymity: classes below k emitted with counts, nulls group " +
    "as a quasi value, empty result when everything is k-anonymous") {
    import spark.implicits._
    val df = (Seq.fill(5)(("a", "x")) ++ Seq.fill(2)(("a", "y")) :+
      (("b", null.asInstanceOf[String])))
      .toDF("q1", "q2")
    val got = Quality.kAnonymity(df, Seq("q1", "q2"), k = 3)
      .as[(String, Option[String], Long)].collect().toSet
    assert(got == Set(("a", Some("y"), 2L), ("b", None, 1L)), got.toString)
    assert(Quality.kAnonymity(df, Seq("q1", "q2"), k = 2)
      .collect().map(_.getLong(2)).toSet == Set(1L))
    // generalizing to q1 alone merges a's classes but b stays unique
    assert(Quality.kAnonymity(df, Seq("q1"), k = 2)
      .as[(String, Long)].collect().toSet == Set(("b", 1L)))
    // the pass certificate: every class at least k
    val ok = (Seq.fill(3)("a") ++ Seq.fill(3)("b")).toDF("q1")
    assert(Quality.kAnonymity(ok, Seq("q1"), k = 3).isEmpty)
  }

  test("cliffsDelta: hand pairs with ties; +1/-1 at complete " +
    "separation; 0 on identical distributions; = 2*AUC - 1") {
    import spark.implicits._
    // X(pos) = {3,5}, Y(neg) = {1,5}: conc 2, disc 1, tied 1 -> .25
    val df = Seq((3.0, true), (5.0, true), (1.0, false), (5.0, false))
      .toDF("v", "p")
    val d0 = Quality.cliffsDelta(df, "v", col("p"))
      .as[(Long, Long, Option[Double])].collect().head
    assert(d0 == ((2L, 2L, Some(0.25))), d0.toString)
    // complete separation
    val sep = Seq((10.0, true), (11.0, true), (1.0, false), (2.0, false))
      .toDF("v", "p")
    assert(Quality.cliffsDelta(sep, "v", col("p"))
      .select("delta").as[Double].head() == 1.0)
    // identical distributions -> 0
    val same = Seq((1.0, true), (2.0, true), (1.0, false), (2.0, false))
      .toDF("v", "p")
    assert(Quality.cliffsDelta(same, "v", col("p"))
      .select("delta").as[Double].head() == 0.0)
    // delta == 2*auc - 1 on a mixed fixture (both from exact integers)
    val mix = Seq((1.0, true), (4.0, true), (2.0, false), (3.0, false),
      (4.0, false)).toDF("v", "p")
    val dlt = Quality.cliffsDelta(mix, "v", col("p"))
      .select("delta").as[Double].head()
    val auc = Quality.rocAuc(mix, "v", col("p"))
      .select("auc").as[Double].head()
    assert(math.abs(dlt - (2 * auc - 1)) < 2e-6, s"$dlt vs $auc")
  }

  test("brierDecomposition: hand-computed decomposition on " +
    "bin-constant forecasts; brier = rel - res + unc on the grid; " +
    "a perfectly calibrated forecaster has ~zero reliability") {
    import spark.implicits._
    // two bin-constant forecast groups: p=.2 (1 pos of 4),
    // p=.8 (3 pos of 4) -> base rate .5
    val df = (Seq.fill(3)((0.2, false)) ++ Seq((0.2, true)) ++
      Seq.fill(3)((0.8, true)) ++ Seq((0.8, false)))
      .toDF("p", "y")
    val r = Quality.brierDecomposition(df, "p", col("y"), bins = 10)
      .collect().head
    val (n, base, brier, rel, res, unc) = (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(n == 8 && base == 0.5, r.toString)
    // brier = mean of (.2-y)^2/(.8-y)^2: 3*.04+1*.64+3*.04+1*.64 /8
    assert(brier == (3 * 0.04 + 0.64 + 3 * 0.04 + 0.64) / 8,
      r.toString)
    // rel: bins at .2 (acc .25) and .8 (acc .75):
    // each (0.05)^2*4/8 = 0.00125 -> 0.0025 total
    assert(math.abs(rel - 0.0025) < 3e-6, r.toString)
    // res: each bin (.25-.5)^2*4/8 = 0.03125 -> 0.0625
    assert(math.abs(res - 0.0625) < 3e-6, r.toString)
    assert(unc == 0.25, r.toString)
    // the Murphy identity on bin-constant forecasts
    assert(math.abs(brier - (rel - res + unc)) < 5e-6, r.toString)
    // perfectly calibrated: p = empirical rate per bin
    val cal = (Seq.fill(1)((0.25, true)) ++ Seq.fill(3)((0.25, false)) ++
      Seq.fill(3)((0.75, true)) ++ Seq((0.75, false))).toDF("p", "y")
    val rc = Quality.brierDecomposition(cal, "p", col("y"), bins = 4)
      .collect().head
    assert(rc.getDouble(3) < 1e-5, rc.toString)
  }

  test("diffInDiff: hand-computed 2x2 ATT, pooled SE and t; a common " +
    "shock alone gives did = 0; an empty cell NULLs the estimate") {
    import spark.implicits._
    // T: pre {1,3} post {6,8}; C: pre {2,4} post {3,5}
    // means: 2, 7, 3, 4 -> did = (7-2) - (4-3) = 4
    // every cell's ss = 2 -> s2 = 8/(8-4)/1 = 2; se = sqrt(2*4/2)=2
    val df = Seq(
      (true, false, 1.0), (true, false, 3.0),
      (true, true, 6.0), (true, true, 8.0),
      (false, false, 2.0), (false, false, 4.0),
      (false, true, 3.0), (false, true, 5.0)).toDF("t", "p", "v")
    val r = Quality.diffInDiff(df, "v", col("t"), col("p"))
      .collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 2 &&
      r.getLong(2) == 2 && r.getLong(3) == 2, r.toString)
    assert(r.getDouble(4) == 2.0 && r.getDouble(5) == 7.0 &&
      r.getDouble(6) == 3.0 && r.getDouble(7) == 4.0, r.toString)
    assert(r.getDouble(8) == 4.0, r.toString)
    assert(r.getDouble(9) == math.sqrt(2.0 * 2.0), r.toString)
    assert(r.getDouble(10) == BigDecimal(4.0 / 2.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      r.toString)
    // pure common shock: both arms +10 in post -> did exactly 0
    val shock = Seq(
      (true, false, 1.0), (true, true, 11.0),
      (false, false, 2.0), (false, true, 12.0),
      (true, false, 3.0), (true, true, 13.0),
      (false, false, 4.0), (false, true, 14.0)).toDF("t", "p", "v")
    val s = Quality.diffInDiff(shock, "v", col("t"), col("p"))
      .collect().head
    assert(s.getDouble(8) == 0.0, s.toString)
    // a missing cell -> NULL did
    val hole = Seq((true, true, 1.0), (false, false, 2.0),
      (false, true, 3.0)).toDF("t", "p", "v")
    val h = Quality.diffInDiff(hole, "v", col("t"), col("p"))
      .collect().head
    assert(h.isNullAt(8) && h.isNullAt(9) && h.isNullAt(10),
      h.toString)
  }

  test("msprtCurve: hand-computed log-lambda on a two-period " +
    "fixture; always-valid p is monotone non-increasing and collapses " +
    "under a strong effect; a null effect keeps p high; degenerate " +
    "periods report p = 1") {
    import spark.implicits._
    // period 1: t = {10, 12}, c = {1, 3}; period 2 adds t = {11, 13},
    // c = {2, 2} — a strong persistent effect
    val strong = Seq(
      (1L, true, 10.0), (1L, true, 12.0), (1L, false, 1.0),
      (1L, false, 3.0),
      (2L, true, 11.0), (2L, true, 13.0), (2L, false, 2.0),
      (2L, false, 2.0)).toDF("d", "t", "v")
    val got = Quality.msprtCurve(strong, "v", col("t"), col("d"),
        tauMicros = 1000000L)
      .orderBy("period")
      .as[(Long, Long, Long, Option[Double], Option[Double], Double)]
      .collect()
    // hand replay of period 1: nt=nc=2, theta=9, ss_t=2 ss_c=2 ->
    // sig2=(2+2)/2=2, V=2*4/4=2, tau2=1:
    // lnL = .5*ln(2/3) + 1*81/(2*2*3)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expL1 = r6(0.5 * math.log(2.0 / 3.0) + 81.0 / 12.0)
    assert(got(0)._5.contains(expL1), s"${got(0)} vs $expL1")
    assert(got(0)._6 == r6(math.exp(-expL1)), got(0).toString)
    // p monotone non-increasing
    assert(got(1)._6 <= got(0)._6, got.mkString(","))
    assert(got(1)._6 < 0.01, "strong effect must collapse p")
    // null effect: identical arms -> theta 0 -> lnL < 0 -> p = 1
    val nullE = Seq((1L, true, 5.0), (1L, true, 7.0),
      (1L, false, 5.0), (1L, false, 7.0)).toDF("d", "t", "v")
    val pNull = Quality.msprtCurve(nullE, "v", col("t"), col("d"))
      .select("always_valid_p").as[Double].collect().head
    assert(pNull == 1.0, s"null-effect p $pNull")
    // degenerate: one arm empty -> NULL lnL, p = 1
    val lone = Seq((1L, true, 5.0), (1L, true, 6.0)).toDF("d", "t", "v")
    val dgn = Quality.msprtCurve(lone, "v", col("t"), col("d"))
      .as[(Long, Long, Long, Option[Double], Option[Double], Double)]
      .collect().head
    assert(dgn._5.isEmpty && dgn._6 == 1.0, dgn.toString)
  }

  test("upliftCurve: hand-computed uplift and qini at every distinct " +
    "threshold; empty control at a depth yields NULL, never 0") {
    import spark.implicits._
    val df = Seq(
      (4.0, true, true),
      (3.0, true, true), (3.0, false, false),
      (2.0, true, false), (2.0, false, true),
      (1.0, true, true), (1.0, false, false)
    ).toDF("score", "t", "y")
    val got = Quality.upliftCurve(df, "score", col("t"), col("y"))
      .as[(Double, Long, Long, Long, Long, Option[Double],
        Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    // s>=4: only a treated row -> both metrics undefined
    assert(got(4.0) == ((1L, 0L, 1L, 0L, None, None)), got.toString)
    // s>=3: t(2,2 pos) wait: n_t=2 pos_t=2, n_c=1 pos_c=0
    assert(got(3.0) == ((2L, 1L, 2L, 0L, Some(1.0), Some(2.0))),
      got.toString)
    // s>=2: n_t=3 pos_t=2, n_c=2 pos_c=1 -> uplift 2/3-1/2, qini
    // 2 - 1*(3/2)
    assert(got(2.0) == ((3L, 2L, 2L, 1L, Some(0.166667), Some(0.5))),
      got.toString)
    // s>=1: n_t=4 pos_t=3, n_c=3 pos_c=1
    assert(got(1.0)._5.get == BigDecimal(3.0 / 4 - 1.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      got.toString)
    assert(got(1.0)._6.get == BigDecimal(3.0 - 1.0 * 4 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      got.toString)
  }

  test("quantileNormalize: two groups with different scales map onto " +
    "the SAME normalized distribution (hand order statistics); ties " +
    "share a rank; extremes map to global extremes") {
    import spark.implicits._
    val df = (Seq(1.0, 2.0, 3.0).map(("g1", _)) ++
      Seq(10.0, 20.0, 30.0).map(("g2", _))).toDF("grp", "v")
    val got = Quality.quantileNormalize(df, "grp", "v")
      .select("grp", "value", "k", "normalized")
      .as[(String, Double, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // global sorted = [1,2,3,10,20,30], N=6; each group n=3:
    // r2 = 2,4,6 -> k = ceil(r2*7/8) = 2,4,6 -> 2, 10, 30
    assert(got(("g1", 1.0)) == ((2L, 2.0)), got.toString)
    assert(got(("g1", 2.0)) == ((4L, 10.0)), got.toString)
    assert(got(("g1", 3.0)) == ((6L, 30.0)), got.toString)
    assert(got(("g2", 10.0)) == ((2L, 2.0)), got.toString)
    assert(got(("g2", 20.0)) == ((4L, 10.0)), got.toString)
    assert(got(("g2", 30.0)) == ((6L, 30.0)), got.toString)
    // the normalization property itself: both groups now identical
    val dist = Quality.quantileNormalize(df, "grp", "v")
      .groupBy("grp").agg(sort_array(collect_list("normalized")))
      .collect().map(_.getSeq[Double](1)).distinct
    assert(dist.size == 1, dist.toString)
    // ties: duplicated value in one group gets ONE row, count 2,
    // shared rank
    val t = Quality.quantileNormalize(
        Seq(("a", 5.0), ("a", 5.0), ("a", 7.0), ("b", 1.0))
          .toDF("grp", "v"), "grp", "v")
      .filter(col("grp") === "a" && col("value") === 5.0)
      .select("n", "k").as[(Long, Long)].collect()
    assert(t.length == 1 && t.head._1 == 2L, t.toSeq.toString)
  }

  test("datasetFingerprint: invariant under row order and " +
    "repartitioning; any cell change moves it; null vs empty " +
    "distinguished; shard fingerprints ADD to the whole") {
    import spark.implicits._
    type FP = (Long, BigDecimal, BigDecimal)
    def fp(df: org.apache.spark.sql.DataFrame): FP = {
      val r = Quality.datasetFingerprint(df, Seq("k", "s"))
        .collect().head
      (r.getLong(0), BigDecimal(r.getLong(1)), BigDecimal(r.getLong(2)))
    }
    val base = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("k", "s")
    val a = fp(base)
    // order + partitioning invariance
    assert(fp(base.orderBy(col("s").desc).repartition(7)) == a)
    // one changed cell moves BOTH sums
    val mut = fp(Seq((1L, "alpha"), (2L, "betb"), (3L, "gamma"))
      .toDF("k", "s"))
    assert(mut._2 != a._2 && mut._3 != a._3, s"$mut vs $a")
    // null and empty canonicalize differently
    val withNull = fp(Seq((1L, null.asInstanceOf[String])).toDF("k", "s"))
    val withEmpty = fp(Seq((1L, "")).toDF("k", "s"))
    assert(withNull._2 != withEmpty._2, s"$withNull vs $withEmpty")
    // mergeability: shard sums add to the whole
    val s1 = fp(base.filter(col("k") <= 1))
    val s2 = fp(base.filter(col("k") > 1))
    val p = BigDecimal(Quality.FpMod)
    assert(s1._1 + s2._1 == a._1 && (s1._2 + s2._2) % p == a._2 &&
      (s1._3 + s2._3) % p == a._3, s"$s1 + $s2 != $a")
    // the hash IS the portable 31-poly fold (pinned: "1" + sep + "a")
    val probe = {
      val r = Quality.datasetFingerprint(
          Seq((1L, "a")).toDF("k", "s"), Seq("k", "s"))
        .collect().head
      (r.getLong(0), BigDecimal(r.getLong(1)), BigDecimal(r.getLong(2)))
    }
    val expect = "1\u0001a".foldLeft(0L)((h, c) =>
      (h * 31 + c.toInt) % 2147483647L)
    assert(probe._2 == BigDecimal(expect), s"${probe._2} vs $expect")
  }

  test("powerSampleSize: scalar replication of the normal-approx " +
    "sizing; target outside (0,1) NULLs the size; negative mde " +
    "sizes a drop test") {
    import spark.implicits._
    val df = (1 to 10).map(i => Tuple1(i <= 2)).toDF("conv")
    val got = Quality.powerSampleSize(df, col("conv"), mde = 0.05)
      .as[(Long, Double, Double, Option[Long], Option[Long])]
      .collect().head
    val z2 = (1.959964 + 0.841621) * (1.959964 + 0.841621)
    val (p1, p2) = (0.2, 0.2 + 0.05)
    val n = math.ceil(z2 * (p1 * (1.0 - p1) + p2 * (1.0 - p2)) /
      (0.05 * 0.05)).toLong
    assert(got._1 == 10L && got._2 == 0.2 && got._3 == 0.25)
    assert(got._4.contains(n) && got._5.contains(2 * n),
      got.toString)
    // p2 past 1.0: counts reported, sizes NULL
    val high = Seq(true, true, true).toDF("conv")
    val h = Quality.powerSampleSize(high, col("conv"), mde = 0.05)
      .as[(Long, Double, Double, Option[Long], Option[Long])]
      .collect().head
    assert(h._2 == 1.0 && h._4.isEmpty && h._5.isEmpty, h.toString)
    // a negative mde sizes a DROP detection
    val half = Seq(true, false).toDF("conv")
    val d = Quality.powerSampleSize(half, col("conv"), mde = -0.1)
      .as[(Long, Double, Double, Option[Long], Option[Long])]
      .collect().head
    assert(d._3 == 0.4 && d._4.nonEmpty, d.toString)
  }

  test("offPolicyValue: hand IPS/SNIPS/ESS; p<=0 rows excluded; " +
    "replaying the logged policy under constant p recovers the " +
    "mean reward; zero matches NULL SNIPS") {
    import spark.implicits._
    val df = Seq(
      ("x", 2.0, 0.5, 1), ("y", 1.0, 0.5, 1),
      ("y", 3.0, 0.25, 2), ("x", 9.0, 0.0, 1))
      .toDF("a", "r", "p", "ctx")
    val tgt = when(col("ctx") === 1, "x").otherwise("y")
    val got = Quality.offPolicyValue(df, "a", "r", "p", tgt)
      .as[(Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().head
    // matches: (x,2,.5) w=2 wr=4 w2=4; (y,3,.25) w=4 wr=12 w2=16
    assert(got._1 == 3L && got._2 == 2L)
    assert(got._3.contains(0.666667))
    assert(got._4.contains(5.333333)) // 16/3
    assert(got._5.contains(2.666667)) // 16/6
    assert(got._6.contains(1.8), got.toString) // 36/20
    // identity check: target == logged action, constant p -> SNIPS
    // is exactly the mean logged reward
    val self = Quality.offPolicyValue(df.filter(col("p") > 0),
        "a", "r", "p", col("a"))
      .as[(Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().head
    assert(self._2 == 3L && self._3.contains(1.0))
    val none = Quality.offPolicyValue(df, "a", "r", "p", lit("zzz"))
      .as[(Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().head
    assert(none._2 == 0L && none._4.contains(0.0) &&
      none._5.isEmpty && none._6.isEmpty, none.toString)
    val const = Seq(("x", 2.0, 0.5), ("y", 4.0, 0.5), ("x", 6.0, 0.5))
      .toDF("a", "r", "p")
    val c = Quality.offPolicyValue(const, "a", "r", "p", col("a"))
      .as[(Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().head
    assert(c._5.contains(4.0), c.toString) // mean reward exactly
  }

  test("ndcgAtK: scalar replication; already-ideal list scores 1.0; " +
    "no-relevant list NULLs ndcg; ranks beyond k are ignored") {
    import spark.implicits._
    val df = Seq(
      ("q1", 1L, 1L), ("q1", 2L, 0L), ("q1", 3L, 1L), ("q1", 4L, 0L),
      ("q2", 1L, 0L), ("q2", 2L, 0L),
      ("q3", 1L, 1L), ("q3", 2L, 1L), ("q3", 3L, 0L),
      ("q3", 11L, 1L)).toDF("q", "r", "rel")
    val got = Quality.ndcgAtK(df, "q", "r", "rel", k = 10)
      .as[(String, Long, Long, Double, Double, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def g(rank: Long, rel: Long) =
      r6(rel.toDouble * (math.log(2.0) / math.log(rank + 1.0)))
    val dcg1 = (BigDecimal(g(1, 1)) + BigDecimal(g(3, 1))).toDouble
    val idcg1 = (BigDecimal(g(1, 1)) + BigDecimal(g(2, 1))).toDouble
    assert(got("q1")._2 == 4L && got("q1")._3 == 2L)
    assert(got("q1")._4 == dcg1 && got("q1")._5 == idcg1)
    assert(got("q1")._6.contains(r6(dcg1 / idcg1)), got("q1").toString)
    assert(got("q2")._3 == 0L && got("q2")._4 == 0.0 &&
      got("q2")._6.isEmpty, got("q2").toString)
    // q3's list is already ideal; the rank-11 row never enters k=10
    assert(got("q3")._2 == 3L && got("q3")._6.contains(1.0),
      got("q3").toString)
  }

  test("fleissKappa: hand 2-item panel; perfect agreement scores 1; " +
    "unequal rating counts and single-category panels NULL kappa") {
    import spark.implicits._
    // i1: (a,a); i2: (a,b) -> pbar=0.5, pe=10/16, kappa=-1/3
    val df = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"))
      .toDF("item", "rating")
    val got = Quality.fleissKappa(df, "item", "rating")
      .as[(Long, Long, Double, Double, Option[Double])]
      .collect().head
    assert(got._1 == 2L && got._2 == 2L)
    assert(got._3 == 0.5 && got._4 == 0.625)
    assert(got._5.contains(-0.333333), got.toString)
    val perfect = Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"))
      .toDF("item", "rating")
    val p = Quality.fleissKappa(perfect, "item", "rating")
      .as[(Long, Long, Double, Double, Option[Double])]
      .collect().head
    assert(p._3 == 1.0 && p._5.contains(1.0), p.toString)
    val uneven = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"),
      (2L, "b")).toDF("item", "rating")
    val u = Quality.fleissKappa(uneven, "item", "rating")
      .as[(Long, Long, Double, Double, Option[Double])]
      .collect().head
    assert(u._5.isEmpty, u.toString)
    val mono = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "a"))
      .toDF("item", "rating")
    val m = Quality.fleissKappa(mono, "item", "rating")
      .as[(Long, Long, Double, Double, Option[Double])]
      .collect().head
    assert(m._3 == 1.0 && m._4 == 1.0 && m._5.isEmpty, m.toString)
  }

  test("krippendorffAlpha: hand panels (perfect 1, chance 0, " +
    "systematic disagreement negative); unequal m handled; " +
    "singleton units dropped; single category NULLs alpha") {
    import spark.implicits._
    def a(rows: Seq[(Long, String)]) =
      Quality.krippendorffAlpha(rows.toDF("item", "rating"),
        "item", "rating")
        .as[(Long, Long, Option[Double], Option[Double],
          Option[Double])].collect().head
    // perfect: (a,a), (b,b) -> D_o = 0, alpha = 1
    val p = a(Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b")))
    assert(p._3.contains(0.0) && p._5.contains(1.0), p.toString)
    // chance-level: (a,a), (a,b) -> D_o = D_e = 0.5, alpha = 0
    val c = a(Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b")))
    assert(c._3.contains(0.5) && c._4.contains(0.5) &&
      c._5.contains(0.0), c.toString)
    // systematic: (a,b), (a,b) -> D_o = 1, D_e = 2/3, alpha = -0.5
    val s = a(Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b")))
    assert(s._5.contains(-0.5), s.toString)
    // unequal m (Fleiss NULLs this): i1 m=3, i2 m=2 both counted;
    // a singleton unit is dropped from units AND pooled totals
    val u = a(Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"),
      (2L, "a"), (3L, "b")))
    assert(u._1 == 2L && u._2 == 5L && u._5.nonEmpty, u.toString)
    // single category ever used: D_e = 0 -> alpha NULL
    val m = a(Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "a")))
    assert(m._3.contains(0.0) && m._5.isEmpty, m.toString)
  }

  test("captureRecapture: Chapman/Lincoln/coverage on a hand " +
    "overlap; zero overlap keeps Chapman finite; duplicate ids " +
    "collapse") {
    import spark.implicits._
    val a = (1L to 6L).map(i => Tuple1(i)).toDF("id")
    val b = (5L to 8L).map(i => Tuple1(i)).toDF("id")
    val got = Quality.captureRecapture(a, b, "id")
      .as[(Long, Long, Long, Double, Option[Double], Option[Double],
        Option[Double])].collect().head
    assert(got._1 == 6L && got._2 == 4L && got._3 == 2L)
    assert(got._4 == 10.666667 && got._5.contains(12.0))
    assert(got._6.contains(0.5625) && got._7.contains(0.375),
      got.toString)
    val z = Quality.captureRecapture(
        Seq(1L).toDF("id"), Seq(2L).toDF("id"), "id")
      .as[(Long, Long, Long, Double, Option[Double], Option[Double],
        Option[Double])].collect().head
    assert(z._3 == 0L && z._4 == 3.0 && z._5.isEmpty &&
      z._6.contains(0.333333), z.toString)
    val dup = Quality.captureRecapture(
        Seq(1L, 1L, 2L).toDF("id"), Seq(2L).toDF("id"), "id")
      .as[(Long, Long, Long, Double, Option[Double], Option[Double],
        Option[Double])].collect().head
    assert(dup._1 == 2L && dup._3 == 1L, dup.toString)
  }

  test("mcnemarTest: only discordant pairs count; Edwards " +
    "continuity clamps b=c to 0; never-discordant NULLs chi2; " +
    "null predictions excluded") {
    import spark.implicits._
    val df = Seq((true, true), (true, false), (true, false),
      (true, false), (false, true), (false, false)).toDF("a", "b")
    val got = Quality.mcnemarTest(df, col("a"), col("b"))
      .as[(Long, Long, Long, Option[Double])].collect().head
    // a_only=3, b_only=1: chi2 = (|3-1|-1)^2 / 4 = 0.25
    assert(got == ((6L, 3L, 1L, Some(0.25))), got.toString)
    val even = Seq((true, false), (false, true), (true, true))
      .toDF("a", "b")
    val e = Quality.mcnemarTest(even, col("a"), col("b"))
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(e == ((3L, 1L, 1L, Some(0.0))), e.toString)
    val agree = Seq((true, true), (false, false)).toDF("a", "b")
    val g = Quality.mcnemarTest(agree, col("a"), col("b"))
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(g._4.isEmpty && g._1 == 2L, g.toString)
    val withNull = Seq((Some(true), true), (None, false))
      .toDF("a", "b")
    assert(Quality.mcnemarTest(withNull, col("a"), col("b"))
      .collect().head.getLong(0) == 1L)
  }

  test("cochranArmitage: scalar replication on a perfect trend; " +
    "constant outcome and single dose NULL the z") {
    import spark.implicits._
    // doses 1,2,3 with rates 0/2, 1/2, 2/2: T=2, Var=1, z=2
    val df = Seq((1L, false), (1L, false), (2L, true), (2L, false),
      (3L, true), (3L, true)).toDF("d", "pos")
    val got = Quality.cochranArmitage(df, "d", col("pos"))
      .as[(Long, Long, Long, Double, Option[Double])].collect().head
    assert(got == ((3L, 6L, 3L, 2.0, Some(2.0))), got.toString)
    val const = Seq((1L, true), (2L, true)).toDF("d", "pos")
    val c = Quality.cochranArmitage(const, "d", col("pos"))
      .as[(Long, Long, Long, Double, Option[Double])].collect().head
    assert(c._5.isEmpty && c._3 == 2L, c.toString)
    val mono = Seq((2L, true), (2L, false)).toDF("d", "pos")
    val m = Quality.cochranArmitage(mono, "d", col("pos"))
      .as[(Long, Long, Long, Double, Option[Double])].collect().head
    assert(m._1 == 1L && m._5.isEmpty, m.toString)
  }

  test("anovaF: scalar replication on two clean groups; " +
    "zero-variance corpus NULLs F and eta; single group NULLs F") {
    import spark.implicits._
    // A=[1,2,3], B=[5,6,7]: T=12+108, G=96 -> SSB=24, SSW=4,
    // F=(24/1)/(4/4)=24, eta=24/28
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 5.0), ("b", 6.0), ("b", 7.0)).toDF("g", "v")
    val got = Quality.anovaF(df, "g", "v")
      .as[(Long, Long, Double, Double, Option[Double],
        Option[Double])].collect().head
    assert(got._1 == 2L && got._2 == 6L)
    assert(got._3 == 24.0 && got._4 == 4.0)
    assert(got._5.contains(24.0) && got._6.contains(0.857143),
      got.toString)
    val flat = Seq(("a", 2.0), ("a", 2.0), ("b", 2.0), ("b", 2.0))
      .toDF("g", "v")
    val f = Quality.anovaF(flat, "g", "v")
      .as[(Long, Long, Double, Double, Option[Double],
        Option[Double])].collect().head
    assert(f._3 == 0.0 && f._4 == 0.0 && f._5.isEmpty && f._6.isEmpty,
      f.toString)
    val one = Seq(("a", 1.0), ("a", 5.0)).toDF("g", "v")
    val o = Quality.anovaF(one, "g", "v")
      .as[(Long, Long, Double, Double, Option[Double],
        Option[Double])].collect().head
    assert(o._1 == 1L && o._5.isEmpty, o.toString)
  }

  test("mutualInformation: perfect association scores U=1 both " +
    "ways; independence scores 0; many-to-one is asymmetric; " +
    "constant column NULLs its own U") {
    import spark.implicits._
    def mi(df: org.apache.spark.sql.DataFrame) =
      Quality.mutualInformation(df, "x", "y")
        .as[(Long, Double, Double, Double, Double, Option[Double],
          Option[Double])].collect().head
    val p = mi(Seq(("a1", "b1"), ("a1", "b1"), ("a2", "b2"),
      ("a2", "b2"), ("a2", "b2")).toDF("x", "y"))
    assert(p._1 == 5L && p._2 == p._3 && p._3 == p._4)
    assert(p._5 == p._2 && p._6.contains(1.0) && p._7.contains(1.0),
      p.toString)
    val i = mi(Seq(("a", "u"), ("a", "v"), ("b", "u"), ("b", "v"))
      .toDF("x", "y"))
    assert(i._5 == 0.0 && i._6.contains(0.0) && i._7.contains(0.0),
      i.toString)
    // a,b -> u; c -> v: knowing X pins Y (U_yx = 1) but not back
    val m = mi(Seq(("a", "u"), ("b", "u"), ("c", "v")).toDF("x", "y"))
    assert(m._7.contains(1.0) && m._6.get < 1.0 && m._5 == m._3,
      m.toString)
    val c = mi(Seq(("k", "u"), ("k", "v")).toDF("x", "y"))
    assert(c._2 == 0.0 && c._5 == 0.0 && c._6.isEmpty, c.toString)
  }

  test("hellingerDrift: identical samples score H=0, BC=1, " +
    "b_distance normalized +0.0; disjoint binned supports score " +
    "H=1 with NULL b_distance") {
    import spark.implicits._
    // 1..10 into 5 equal-population bins: every bin share is 0.2 on
    // both sides -> each term sqrt(0.04)=0.2 exactly, BC = 1.0
    val same = (1 to 10).map(_.toDouble).toDF("v")
    val s = Quality.hellingerDrift(same, same, "v", bins = 5)
      .as[(Long, Long, Double, Double, Option[Double])]
      .collect().head
    assert(s._1 == 10L && s._2 == 10L)
    assert(s._3 == 1.0 && s._4 == 0.0)
    assert(s._5.contains(0.0), s.toString)
    // -0.0 would hash-differ from 0.0: assert the normalized sign
    assert(java.lang.Double.doubleToLongBits(s._5.get) == 0L)
    // constant ref collapses every quantile: ref lives in bin 1,
    // far-away cur lands in the top bin -> no co-occupied bin
    val ref = Seq.fill(4)(5.0).toDF("v")
    val cur = Seq.fill(3)(100.0).toDF("v")
    val d = Quality.hellingerDrift(ref, cur, "v", bins = 10)
      .as[(Long, Long, Double, Double, Option[Double])]
      .collect().head
    assert(d._1 == 4L && d._2 == 3L)
    assert(d._3 == 0.0 && d._4 == 1.0 && d._5.isEmpty, d.toString)
    // nulls excluded from both sides
    val withNull = Seq(Some(1.0), None, Some(2.0)).toDF("v")
    val n = Quality.hellingerDrift(withNull, withNull, "v", bins = 2)
      .as[(Long, Long, Double, Double, Option[Double])]
      .collect().head
    assert(n._1 == 2L && n._2 == 2L && n._3 == 1.0)
  }
}
