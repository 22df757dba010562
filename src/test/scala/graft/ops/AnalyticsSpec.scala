package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnel: greedy earliest-match cascade enforces stage order") {
    val df = Seq(
      // u1 completes all three in order
      (1L, "view", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 01:00:00")),
      (1L, "purchase", ts("2024-01-01 02:00:00")),
      // u2: click BEFORE any view — stage 2 unreached (no click after
      // the first view), purchase later must NOT count either
      (2L, "click", ts("2024-01-02 00:00:00")),
      (2L, "view", ts("2024-01-02 01:00:00")),
      (2L, "purchase", ts("2024-01-02 02:00:00")),
      // u3: view+click only
      (3L, "view", ts("2024-01-03 00:00:00")),
      (3L, "click", ts("2024-01-03 00:30:00")),
      // u4: no view at all — contributes to no stage
      (4L, "purchase", ts("2024-01-04 00:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = Analytics.funnel(df, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .orderBy("stage_idx")
      .select("stage", "users", "conversion")
      .as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(("view", 3L, 1.0), ("click", 2L, 0.666667),
      ("purchase", 1L, 0.333333)))
  }

  test("funnel: equal timestamps count as ordered-after") {
    val df = Seq(
      (1L, "view", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 00:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = Analytics.funnel(df, "user_id", "event_type", "ts",
        Seq("view", "click"))
      .orderBy("stage_idx").select("users").as[Long].collect().toSeq
    assert(out == Seq(1L, 1L))
  }

  test("funnel: greedy uses the EARLIEST qualifying event per stage") {
    // u1 has two views; the click sits between them — the cascade must
    // anchor on the FIRST view, so the click qualifies
    val df = Seq(
      (1L, "view", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 00:10:00")),
      (1L, "view", ts("2024-01-01 01:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = Analytics.funnel(df, "user_id", "event_type", "ts",
        Seq("view", "click"))
      .orderBy("stage_idx").select("users").as[Long].collect().toSeq
    assert(out == Seq(1L, 1L))
  }

  test("funnel with a conversion window: stages beyond the stage-1 " +
    "anchor's horizon do not count") {
    val df = Seq(
      // u1 converts inside 1h window
      (1L, "view", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 00:30:00")),
      // u2 clicks 2h after the first view — outside the window, even
      // though a later view would have been close enough (the anchor
      // is the FIRST view, standard first-touch attribution)
      (2L, "view", ts("2024-01-02 00:00:00")),
      (2L, "view", ts("2024-01-02 01:30:00")),
      (2L, "click", ts("2024-01-02 02:00:00")),
      // u3 clicks exactly AT the horizon boundary — inclusive
      (3L, "view", ts("2024-01-03 00:00:00")),
      (3L, "click", ts("2024-01-03 01:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = Analytics.funnel(df, "user_id", "event_type", "ts",
        Seq("view", "click"), horizonSeconds = Some(3600L))
      .orderBy("stage_idx").select("users").as[Long].collect().toSeq
    assert(out == Seq(3L, 2L))
  }

  test("funnel: empty corpus yields zero-user rows, null conversion") {
    val df = Seq.empty[(Long, String, java.sql.Timestamp)]
      .toDF("user_id", "event_type", "ts")
    val out = Analytics.funnel(df, "user_id", "event_type", "ts",
        Seq("view", "click"))
      .orderBy("stage_idx")
      .select("users", "conversion")
      .as[(Long, Option[Double])].collect().toSeq
    assert(out == Seq((0L, None), (0L, None)))
  }

  test("cohortRetention: offsets count Monday-truncated weeks from first event") {
    val df = Seq(
      // u1 first event Tue 2024-01-02 -> cohort week Mon 2024-01-01
      (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-08 09:00:00")),  // next Mon -> offset 1
      (1L, ts("2024-01-21 23:00:00")),  // Sun of week 3 -> offset 2
      // u2 first event Mon 2024-01-08 -> its own cohort
      (2L, ts("2024-01-08 00:00:00"))
    ).toDF("user_id", "ts")
    val out = Analytics.cohortRetention(df, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .select(col("cohort_week").cast("string"), col("week_offset"),
        col("active_users"))
      .as[(String, Int, Long)].collect().toSeq
    assert(out == Seq(
      ("2024-01-01 00:00:00", 0, 1L),
      ("2024-01-01 00:00:00", 1, 1L),
      ("2024-01-01 00:00:00", 2, 1L),
      ("2024-01-08 00:00:00", 0, 1L)))
  }

  test("cohortRetention: a week with both cohorts active counts users per cohort") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (2L, ts("2024-01-08 00:00:00")),
      (1L, ts("2024-01-10 00:00:00"))   // u1 active in u2's cohort week
    ).toDF("user_id", "ts")
    val out = Analytics.cohortRetention(df, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .select(col("week_offset"), col("active_users"))
      .as[(Int, Long)].collect().toSeq
    // cohort 01-01: offsets 0 and 1 (u1); cohort 01-08: offset 0 (u2)
    assert(out == Seq((0, 1L), (1, 1L), (0, 1L)))
  }

  test("funnel maxEventsPerUser: a bot user's array is bounded, the " +
    "drop count is observable, and in-cap stage matches are unaffected") {
    // user 1 = bot: 3 real stage matches in its FIRST events, then 5000
    // later junk views that would otherwise all land in one per-user
    // array; user 2 = normal converter. Cap 100 keeps each user's first
    // 100 stage-typed events by time: both users' true stage matches
    // are inside the cap, so the capped funnel must equal the uncapped
    // one while dropping 4903 of the bot's rows.
    val bot = Seq(
      (1L, "view", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 01:00:00")),
      (1L, "purchase", ts("2024-01-01 02:00:00"))) ++
      (1 to 5000).map(i => (1L, "view",
        new java.sql.Timestamp(
          ts("2024-01-02 00:00:00").getTime + i * 1000L)))
    val normal = Seq(
      (2L, "view", ts("2024-01-03 00:00:00")),
      (2L, "click", ts("2024-01-03 01:00:00")),
      (2L, "purchase", ts("2024-01-03 02:00:00")))
    val df = (bot ++ normal).toDF("user_id", "event_type", "ts")
    val stages = Seq("view", "click", "purchase")
    val uncapped = Analytics.funnel(df, "user_id", "event_type", "ts",
      stages).orderBy("stage_idx")
      .select("stage", "users").as[(String, Long)].collect().toSeq
    assert(uncapped == Seq(("view", 2L), ("click", 2L), ("purchase", 2L)))
    // observedMetrics does not traverse the adaptive plan in Spark 4.1
    // (same pin as the editDistanceJoin cap spec): read it with AQE off
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqeWas = spark.conf.get(aqeKey)
    try {
      spark.conf.set(aqeKey, "false")
      // observedMetrics lives on the EXECUTED Dataset's QueryExecution:
      // keep the collected frame and the metrics read on the same val
      val capped = Analytics.funnel(df, "user_id", "event_type", "ts",
          stages, maxEventsPerUser = Some(100))
        .orderBy("stage_idx").select("stage", "users")
      // collect on `capped` ITSELF (even .as[...] builds a fresh
      // QueryExecution whose metrics would stay empty)
      val got = capped.collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == uncapped, "in-cap stage matches must be unaffected")
      val dropped = capped.queryExecution.observedMetrics
        .get("funnel_dropped_events").map(_.getLong(0))
      assert(dropped.contains(4903L),
        s"expected 4903 dropped bot rows, got $dropped")
    } finally spark.conf.set(aqeKey, aqeWas)
  }

  test("rfmSegments: clean quintiles score 1..5; equal recency scores " +
    "5 everywhere; segment concatenates the scores") {
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    // user i makes i purchases of 10.0 on the same day -> frequency
    // 1..10 (quintiles 2.8/4.6/6.4/8.2), monetary 10..100, recency 0
    val rows = for {
      u <- 1 to 10; k <- 1 to u
    } yield (u.toLong * 100 + k, ts(15), u.toLong, "purchase", 10.0, "{}")
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type",
      "value", "props")
    val got = Analytics.rfmSegments(ev, "user_id", "ts",
        col("event_type") === "purchase", "value")
      .select("user_id", "r_score", "f_score", "m_score", "segment")
      .as[(Long, Int, Int, Int, String)].collect()
      .map(r => r._1 -> r).toMap
    (1 to 10).foreach { u =>
      val expected = (u + 1) / 2  // 1,1,2,2,3,3,4,4,5,5
      val (_, r, f, m, seg) = got(u.toLong)
      assert(r == 5, s"user $u: equal recency must score 5, got $r")
      assert(f == expected && m == expected,
        s"user $u: expected f=m=$expected, got f=$f m=$m")
      assert(seg == s"5$expected$expected")
    }
  }

  test("kaplanMeier: hand-computed curve with ties and censoring; " +
    "censored subjects hold the risk set without stepping the curve") {
    val subj = Seq(
      (1L, true), (2L, true), (2L, true),   // tie: two events at t=2
      (3L, false),                          // censored at 3
      (4L, true), (5L, false)               // censored tail
    ).toDF("dur", "obs")
    val got = Analytics.kaplanMeier(subj, "dur", "obs")
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    // t=1: n=6 S=1*(1-1/6)=.833333; t=2: d=2 n=5 S=.833333*.6=.5;
    // t=4: n=2 (censored-at-3 already out) S=.5*.5=.25
    assert(got == Seq(
      (1L, 6L, 1L, 0.833333),
      (2L, 5L, 2L, 0.5),
      (4L, 2L, 1L, 0.25)), got.toString)
  }

  test("nelsonAalen: hand-computed cumulative hazard on the K-M " +
    "fixture; H tracks -ln S on the shared risk sets") {
    val subj = Seq(
      (1L, true), (2L, true), (2L, true), (3L, false),
      (4L, true), (5L, false)
    ).toDF("dur", "obs")
    val got = Analytics.nelsonAalen(subj, "dur", "obs")
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    // t=1: 1/6=.166667; t=2: +2/5=.4 -> .566667; t=4: +1/2 -> 1.066667
    assert(got == Seq(
      (1L, 6L, 1L, 0.166667),
      (2L, 5L, 2L, 0.566667),
      (4L, 2L, 1L, 1.066667)), got.toString)
    // diagnostic: d/n <= -ln(1 - d/n), so H <= -ln S everywhere,
    // converging in the small-d/n limit — on kaplanMeier's risk sets
    val s = Analytics.kaplanMeier(subj, "dur", "obs")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    got.foreach { case (t, _, _, h) =>
      assert(h <= -math.log(s(t)) + 1e-6 &&
        h >= -math.log(s(t)) - 1.0, s"t=$t h=$h s=${s(t)}")
    }
  }

  test("associationRules: hand-computed support/confidence/lift; " +
    "duplicate basket lines collapse; min-support cut") {
    // baskets: {A,B,C} {A,B} {A,B} {A,C} {B} -> supp A=4 B=4 C=2,
    // pairs AB=3, AC=2, BC=1; N=5
    val rows = Seq(
      (1L, "A"), (1L, "B"), (1L, "C"), (1L, "A"), // dup line collapses
      (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "B"),
      (4L, "A"), (4L, "C"),
      (5L, "B")
    ).toDF("basket", "item")
    val got = Analytics.associationRules(rows, "basket", "item",
        minPairSupport = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // AB: conf A->B = 3/4, lift = 3*5/(4*4) = 0.9375
    assert(got(("A", "B")) == ((3L, 0.75, 0.9375)))
    assert(got(("B", "A")) == ((3L, 0.75, 0.9375)))
    // AC: conf A->C = 2/4 = .5, C->A = 2/2 = 1, lift = 2*5/(4*2)=1.25
    assert(got(("A", "C")) == ((2L, 0.5, 1.25)))
    assert(got(("C", "A")) == ((2L, 1.0, 1.25)))
    // BC (support 1) cut by min-support
    assert(!got.contains(("B", "C")) && got.size == 4)
  }

  test("associationRules maxBasketSize: a 10k-item mega-basket is " +
    "dropped whole, its item rows observable, survivors unaffected") {
    // three honest {A,B} baskets + one bot basket with 10k items
    // (including A and B — dropping whole, not truncating, is what
    // keeps the survivors' support arithmetic untouched)
    val honest = (1L to 3L).flatMap(b => Seq((b, "A"), (b, "B")))
    val bot = (1 to 10000).map(i => (99L, s"item_$i"))
    val df = (honest ++ bot).toDF("basket", "item")
    // observedMetrics does not traverse the adaptive plan in Spark 4.1:
    // read it with AQE off (the funnel-cap pin)
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqeWas = spark.conf.get(aqeKey)
    try {
      spark.conf.set(aqeKey, "false")
      val capped = Analytics.associationRules(df, "basket", "item",
        minPairSupport = 2, maxBasketSize = Some(100))
      // collect on `capped` ITSELF (a fresh QueryExecution would show
      // empty metrics)
      val rows = capped.collect().map(r =>
        (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
      // survivors: 3 {A,B} baskets, N=3 -> conf 1.0, lift 3*3/(3*3)=1
      assert(rows == Map(
        ("A", "B") -> ((3L, 1.0, 1.0)),
        ("B", "A") -> ((3L, 1.0, 1.0))), rows.toString)
      val dropped = capped.queryExecution.observedMetrics
        .get("assoc_dropped_items").map(_.getLong(0))
      assert(dropped.contains(10000L),
        s"expected 10000 dropped bot item rows, got $dropped")
    } finally spark.conf.set(aqeKey, aqeWas)
  }

  test("acf: alternating series has lag-1 ACF -1, lag-2 ACF +1; " +
    "constant series yields null") {
    val alt = (1 to 8).map(i =>
      (1L, ts(f"2024-01-01 00:0$i:00"), i.toLong,
        if (i % 2 == 0) 1.0 else -1.0))
    val const = (1 to 8).map(i =>
      (2L, ts(f"2024-01-01 00:0$i:00"), (i + 100).toLong, 5.0))
    val df = (alt ++ const).toDF("user_id", "ts", "event_id", "value")
    val got = Analytics.acf(df, Seq("user_id"), "ts", "event_id",
        "value", maxLag = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    // mean 0: r1 = sum(d_i d_{i+1})/sum(d^2) = -7/8, r2 = +6/8
    assert(got((1L, 1)) == ((7L, -0.875)))
    assert(got((1L, 2)) == ((6L, 0.75)))
    // constant: zero deviations -> null ACF at both lags
    assert(got((2L, 1)) == ((7L, null)))
    assert(got((2L, 2)) == ((6L, null)))
  }

  test("dauWau: duplicate events collapse per day; trailing window " +
    "counts each user once; days without own activity don't emit") {
    def t(d: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    val df = Seq(
      (1L, t(1, 9)), (1L, t(1, 15)),  // user 1 twice on day 1
      (2L, t(1, 10)),
      (1L, t(3, 9)),                  // user 1 again on day 3
      (3L, t(9, 9))                   // far later: day 1-2 left the window
    ).toDF("user_id", "ts")
    val got = Analytics.dauWau(df, "user_id", "ts", windowDays = 7)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // day 1: dau {1,2}=2; wau [Dec 26..Jan 1] = {1,2}=2
    // day 3: dau {1}=1; wau [Dec 28..Jan 3] = {1,2}=2
    // day 9: dau {3}=1; wau [Jan 3..9] = {1,3}=2
    assert(got == Map("2024-01-01" -> ((2L, 2L)),
      "2024-01-03" -> ((1L, 2L)), "2024-01-09" -> ((1L, 2L))),
      got.toString)
  }

  test("topSessionPaths: gap splits sessions; paths ordered and " +
    "counted; top-k tie-broken by path") {
    val df = Seq(
      // user 1, session 1: a->b ; session 2 (gap > 600): a->b
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (2L, ts("2024-01-01 00:05:00"), 1L, "b"),
      (3L, ts("2024-01-01 02:00:00"), 1L, "a"),
      (4L, ts("2024-01-01 02:04:00"), 1L, "b"),
      // user 2: one session a->b ; user 3: single-event path c
      (5L, ts("2024-01-01 00:00:00"), 2L, "a"),
      (6L, ts("2024-01-01 00:01:00"), 2L, "b"),
      (7L, ts("2024-01-01 00:00:00"), 3L, "c")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Analytics.topSessionPaths(df, "user_id", "ts",
        "event_id", "event_type", gapSeconds = 600, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a->b", 3L), ("c", 1L)), got.toString)
  }

  test("markovStationary: hand-computed two-round power iteration; " +
    "dead-end states shed mass") {
    // one user's chain: A -> B -> A -> B -> C   (C has no outgoing edge)
    // transitions: A->B x2, B->A x1, B->C x1
    // P: A->B = 1.0 ; B->A = 0.5, B->C = 0.5
    val df = Seq(
      (1L, ts("2024-01-01 00:01:00"), 1L, "A"),
      (1L, ts("2024-01-01 00:02:00"), 2L, "B"),
      (1L, ts("2024-01-01 00:03:00"), 3L, "A"),
      (1L, ts("2024-01-01 00:04:00"), 4L, "B"),
      (1L, ts("2024-01-01 00:05:00"), 5L, "C")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Analytics.markovStationary(df, "user_id", "ts", "event_id",
        "event_type", iters = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // pi0 = round(1/3, 6) = .333333 each
    // pi1: A <- pi0(B)*.5 = round(.1666665) = .166667 (HALF_UP);
    //      B <- pi0(A)*1 = .333333; C <- pi0(B)*.5 = .166667;
    //      C's own mass vanishes (dead end, no outgoing row)
    // pi2: A <- pi1(B)*.5 = .166667; B <- pi1(A)*1 = .166667;
    //      C <- pi1(B)*.5 = .166667
    assert(got == Map("A" -> 0.166667, "B" -> 0.166667,
      "C" -> 0.166667), got.toString)
  }

  test("logRankTest: hand-computed O/E/V/chi2 with censoring; " +
    "identical groups give chi2 ~ 0; degenerate no-variance input " +
    "gives null chi2") {
    import spark.implicits._
    // A: deaths at 1,2, censored 3; B: deaths 2,4, censored 5.
    // times (1,2,4): E terms .5,.8,0 ; V terms .25,.36,0 ->
    // O=2, E=1.3, V=.61, chi2=(0.7)^2/.61=.803279
    val subj = Seq((1L, true, "A"), (2L, true, "A"), (3L, false, "A"),
      (2L, true, "B"), (4L, true, "B"), (5L, false, "B"))
      .toDF("dur", "obs", "g")
    val got = Analytics.logRankTest(subj, "dur", "obs", col("g") === "A")
      .as[(Long, Long, Long, Double, Double, Option[Double])]
      .collect().head
    assert(got == ((3L, 3L, 2L, 1.3, 0.61, Some(0.803279))),
      got.toString)
    // identical curves: every event time splits deaths as expected
    val same = Seq((1L, true, "A"), (2L, true, "A"),
      (1L, true, "B"), (2L, true, "B")).toDF("dur", "obs", "g")
    val z = Analytics.logRankTest(same, "dur", "obs", col("g") === "A")
      .as[(Long, Long, Long, Double, Double, Option[Double])]
      .collect().head
    assert(z._3 == 2L && math.abs(z._4 - 2.0) < 1e-9 &&
      z._6.exists(_ < 0.01), z.toString)
    // single subject per time with n=1 at the last death: V sums to 0
    val degen = Seq((1L, true, "A")).toDF("dur", "obs", "g")
      .unionByName(Seq.empty[(Long, Boolean, String)]
        .toDF("dur", "obs", "g"))
    val d = Analytics.logRankTest(degen, "dur", "obs", col("g") === "A")
      .as[(Long, Long, Long, Double, Double, Option[Double])]
      .collect().head
    assert(d._6.isEmpty, d.toString)
  }

  test("paretoFrontier: dominated points drop, equal-y higher-x " +
    "dominates, duplicates collapse, nulls excluded, and the window " +
    "runs on the distinct-x frame") {
    import spark.implicits._
    val pts = Seq((1, 5.0), (2, 4.0), (2, 9.0), (3, 3.0), (3, 3.0),
      (5, 3.0), (4, 3.0), (6, 1.0)).toDF("x", "y") // (4,3) dominated
      .unionByName(Seq((None: Option[Int], Some(9.0)),
        (Some(7), None: Option[Double])).toDF("x", "y"))
    val got = Analytics.paretoFrontier(pts, "x", "y")
      .as[(Int, Double)].collect().toSet
    // (2,9) kills (1,5) and (2,4); (5,3) kills (3,3) and (4,3)
    // (equal y, larger x dominates); (6,1) survives
    assert(got == Set((2, 9.0), (5, 3.0), (6, 1.0)), got.toString)
  }

  test("giniConcentration: hand values (2/3 for one-unit-takes-all " +
    "with two zeros, 0 for equal shares, 0.5 for {0,1}), multi-row " +
    "units sum first, negatives excluded and counted, empty nulls, " +
    "tiny buckets agree with the default") {
    import spark.implicits._
    val oneTakesAll = Seq(("a", 0.0), ("b", 0.0), ("c", 1.0))
      .toDF("u", "w")
    val g1 = Analytics.giniConcentration(oneTakesAll, Seq("u"), "w")
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(g1 == ((3L, 0L, 1000000L, Some(0.666667))), g1.toString)
    val equal = Seq(("a", 2.0), ("b", 2.0), ("c", 2.0)).toDF("u", "w")
    assert(Analytics.giniConcentration(equal, Seq("u"), "w")
      .as[(Long, Long, Long, Option[Double])].collect().head._4
      .contains(0.0))
    // unit a = 0.5 + 0.5 = 1, unit b = 0 -> {0, 1} -> G = 0.5;
    // a negative unit is excluded and counted
    val mixed = Seq(("a", 0.5), ("a", 0.5), ("b", 0.0), ("neg", -5.0))
      .toDF("u", "w")
    val g2 = Analytics.giniConcentration(mixed, Seq("u"), "w")
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(g2 == ((2L, 1L, 1000000L, Some(0.5))), g2.toString)
    // empty and all-null inputs -> n 0, gini null
    val empty = Seq.empty[(String, Option[Double])].toDF("u", "w")
    val g3 = Analytics.giniConcentration(empty, Seq("u"), "w")
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(g3._1 == 0L && g3._4.isEmpty, g3.toString)
    // bucketSize 2 micro-units forces the cross-bucket offset path
    val g4 = Analytics.giniConcentration(mixed, Seq("u"), "w",
        bucketSize = 2L)
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(g4 == g2, s"tiny-bucket $g4 vs default $g2")
  }

  test("temperatureMix: alpha 1 reproduces raw shares, alpha -> 0 " +
    "flattens toward uniform, multipliers up-sample the small group") {
    import spark.implicits._
    // 90/10 split
    val df = (Seq.fill(90)("big") ++ Seq.fill(10)("small")).toDF("g")
    val a1 = Analytics.temperatureMix(df, Seq("g"),
        alphaMicros = 1000000L)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(a1("big") == (("big", 90L, 0.9, 0.9, 1.0)), a1.toString)
    assert(a1("small") == (("small", 10L, 0.1, 0.1, 1.0)), a1.toString)
    val a3 = Analytics.temperatureMix(df, Seq("g"),
        alphaMicros = 300000L)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // 90^.3 = 3.855784, 10^.3 = 1.995262 -> small share 0.341003
    assert(a3("small")._4 > 0.3 && a3("small")._4 < 0.35, a3.toString)
    assert(a3("small")._5 > 3.0 && a3("big")._5 < 1.0, a3.toString)
    // shares sum to ~1
    assert(math.abs(a3.values.map(_._4).sum - 1.0) < 1e-5, a3.toString)
  }

  test("mannKendall: hand S/var/z with the tie correction on a " +
    "5-point series; Sen lower-median slope; constant series nulls " +
    "z; |S| <= 1 zeroes z by continuity") {
    import spark.implicits._
    val df = Seq((1L, 1.0), (2L, 2.0), (3L, 2.0), (4L, 4.0),
      (5L, 3.0)).toDF("i", "v")
    val got = Analytics.mannKendall(df, "i", "v")
      .as[(Long, Long, Long, Option[Double], Option[Long])]
      .collect().head
    // S = 8 concordant - 1 discordant = 7; 18Var = 5*4*15 - 2*1*9
    val expZ = BigDecimal((7.0 - 1.0) / math.sqrt(282.0 / 18.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == ((5L, 7L, 282L, Some(expZ), Some(500000L))),
      s"$got expected z=$expZ")
    val const = Seq((1L, 9.0), (2L, 9.0), (3L, 9.0)).toDF("i", "v")
    val c = Analytics.mannKendall(const, "i", "v")
      .as[(Long, Long, Long, Option[Double], Option[Long])]
      .collect().head
    assert(c._2 == 0L && c._3 == 0L && c._4.isEmpty &&
      c._5.contains(0L), c.toString)
    val two = Seq((1L, 1.0), (2L, 2.0)).toDF("i", "v")
    val t = Analytics.mannKendall(two, "i", "v")
      .as[(Long, Long, Long, Option[Double], Option[Long])]
      .collect().head
    assert(t._2 == 1L && t._4.contains(0.0), t.toString)
  }

  test("decayedTopK: hand half-life weights, future events excluded, " +
    "k respected, ties break on the key") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ref = ts("2024-01-02 00:00:00")
    val df = Seq(
      ("A", ts("2024-01-02 00:00:00")), ("A", ts("2024-01-01 00:00:00")),
      ("B", ts("2024-01-01 00:00:00")), ("B", ts("2024-01-01 00:00:00")),
      ("C", ts("2023-12-31 00:00:00")), ("C", ts("2024-01-02 01:00:00")))
      .toDF("k", "ts")
    val got = Analytics.decayedTopK(df, Seq("k"), "ts", ref,
        halfLifeHours = 24.0, k = 2)
      .as[(String, Long, Double)].collect().toSeq
    // A: 1 + 0.5 = 1.5 (n=2); B: 0.5 + 0.5 = 1.0; C's future event
    // is excluded, leaving 0.25 (below top-2)
    assert(got == Seq(("A", 2L, 1.5), ("B", 2L, 1.0)), got.toString)
    // ties: equal scores order by key
    val tied = Seq(("z", ref), ("y", ref)).toDF("k", "ts")
    val t = Analytics.decayedTopK(tied, Seq("k"), "ts", ref, 24.0, 2)
      .as[(String, Long, Double)].collect().toSeq
    assert(t == Seq(("y", 1L, 1.0), ("z", 1L, 1.0)), t.toString)
  }

  test("acf: one exchange — mean, deviations and all leads share a " +
    "single user-keyed window") {
    val df = (1 to 20).map(i =>
      (i.toLong % 3, ts(f"2024-01-01 00:${i % 60}%02d:00"), i.toLong,
        i.toDouble)).toDF("user_id", "ts", "event_id", "value")
    val plan = Analytics.acf(df, Seq("user_id"), "ts", "event_id",
      "value", maxLag = 3).queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1, plan)
  }

  test("cumulativeIncidence: hand-computed Aalen-Johansen curve; " +
    "CIF over all causes + all-cause KM survival sums to 1; " +
    "censoring-only times are not steps; cause 0 rejected") {
    import spark.implicits._
    // (dur, cause): t=1 cause1 of 4 at risk; t=2 cause2 of 3; t=3
    // censored (NOT a step); t=4 cause1 of 1
    val subj = Seq((1L, 1), (2L, 2), (3L, 0), (4L, 1))
      .toDF("dur", "cause")
    val c1 = Analytics.cumulativeIncidence(subj, "dur", "cause", 1)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._5))).toMap
    // t=1: S-=1, inc=1/4 -> .25; t=2: no cause-1 event, flat; t=4:
    // S- = round6(.75*round6(2/3)) = .5, inc = .5 -> .75
    assert(c1(1L) == ((4L, 1L, 0.25)), c1.toString)
    assert(c1(2L) == ((3L, 0L, 0.25)), c1.toString)
    assert(c1(4L) == ((1L, 1L, 0.75)), c1.toString)
    assert(!c1.contains(3L), "censoring-only time must not be a step")
    val c2 = Analytics.cumulativeIncidence(subj, "dur", "cause", 2)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(c2(2L) == 0.25 && c2(4L) == 0.25, c2.toString)
    // closure: CIF1(inf) + CIF2(inf) + S(inf) = 1 on the 6-dp grid
    val sInf = Analytics.kaplanMeier(
        subj.withColumn("observed", col("cause") =!= 0), "dur",
        "observed")
      .orderBy(col("t").desc).select("survival").as[Double]
      .collect().head
    assert(math.abs(c1(4L)._3 + c2(4L) + sInf - 1.0) < 2e-6,
      s"${c1(4L)._3} + ${c2(4L)} + $sInf")
    intercept[IllegalArgumentException] {
      Analytics.cumulativeIncidence(subj, "dur", "cause", 0)
    }
  }

  test("rankBiasedOverlap: identical top-3 at p=.9 scores exactly " +
    "0.271; a one-common-item pair scores the hand value; disjoint " +
    "rankings score 0.0 with the query still present") {
    import spark.implicits._
    val a = Seq((1L, "x", 1), (1L, "y", 2), (1L, "z", 3),
      (2L, "x", 1), (2L, "y", 2),
      (3L, "q", 1)).toDF("qid", "item", "rank")
    val b = Seq((1L, "x", 1), (1L, "y", 2), (1L, "z", 3),
      (2L, "y", 1), (2L, "z", 2),
      (3L, "r", 1)).toDF("qid", "item", "rank")
    val got = Analytics.rankBiasedOverlap(a, b, "qid", "item", "rank",
        depth = 3)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // identical top-3: 0.1*(1 + 2*0.45 + 3*0.27) = 0.271
    assert(got(1L) == ((3L, 0.271)), got.toString)
    // q2: only y common (ra=2, rb=1) -> m=2, W(2)=t2+t3=0.45+0.27
    // -> rbo = 0.1*0.72 = 0.072
    assert(got(2L) == ((1L, 0.072)), got.toString)
    // q3: nothing common -> present with 0.0
    assert(got(3L) == ((0L, 0.0)), got.toString)
    // ranks beyond depth are ignored
    val deep = Analytics.rankBiasedOverlap(
        a, b.withColumn("rank", col("rank") + 3), "qid", "item",
        "rank", depth = 3)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(deep.values.forall(_ == 0L), deep.toString)
  }

  test("sinkhornOt: a pure k-bin shift costs exactly k; identical " +
    "distributions cost ~0 at small epsilon; transported mass " +
    "converges to 1; an empty side nulls the metrics") {
    import spark.implicits._
    // all of A at value 0 (bin 0), all of B at value 5 (bin 5 with
    // width 1): the only feasible plan moves every unit 5 bins
    val shift = (Seq.fill(10)((true, 0.0)) ++ Seq.fill(10)((false, 5.0)))
      .toDF("a", "v")
    val got = Analytics.sinkhornOt(shift, "v", col("a"),
        binWidthMicros = 1000000L, iters = 5, epsMicros = 500000L)
      .as[(Long, Long, Long, Option[Double], Option[Double])]
      .collect().head
    assert(got._1 == 10 && got._2 == 10 && got._3 == 2, got.toString)
    assert(math.abs(got._4.get - 5.0) < 1e-3, s"cost ${got._4}")
    assert(math.abs(got._5.get - 1.0) < 1e-3, s"mass ${got._5}")
    // identical two-point distributions: with eps small the kernel is
    // near-diagonal, so almost nothing moves
    val same = (Seq.fill(5)((true, 0.0)) ++ Seq.fill(5)((true, 5.0)) ++
      Seq.fill(5)((false, 0.0)) ++ Seq.fill(5)((false, 5.0)))
      .toDF("a", "v")
    val s = Analytics.sinkhornOt(same, "v", col("a"),
        binWidthMicros = 1000000L, iters = 5, epsMicros = 500000L)
      .as[(Long, Long, Long, Option[Double], Option[Double])]
      .collect().head
    assert(s._4.get < 0.01, s"identical cost ${s._4}")
    assert(math.abs(s._5.get - 1.0) < 1e-2, s"mass ${s._5}")
    // determinism: bit-identical on a second run
    val s2 = Analytics.sinkhornOt(same, "v", col("a"),
        binWidthMicros = 1000000L, iters = 5, epsMicros = 500000L)
      .as[(Long, Long, Long, Option[Double], Option[Double])]
      .collect().head
    assert(s == s2, s"$s vs $s2")
    // an empty B side: counts flow through, metrics NULL
    val lone = Seq.fill(4)((true, 1.0)).toDF("a", "v")
    val e = Analytics.sinkhornOt(lone, "v", col("a"),
        binWidthMicros = 1000000L)
      .as[(Long, Long, Long, Option[Double], Option[Double])]
      .collect().head
    assert(e._1 == 4 && e._2 == 0 && e._4.isEmpty && e._5.isEmpty,
      e.toString)
  }

  test("rmst: hand KM curve integrates exactly; censored-only " +
    "cohort scores tau; tau beyond the curve sums every segment") {
    // 4 observed events at t=2,4,6,8: S = 0.75, 0.5, 0.25, 0
    val subj = Seq((2L, true), (4L, true), (6L, true), (8L, true))
      .toDF("dur", "observed")
    val r5 = Analytics.rmst(subj, "dur", "observed", tau = 5L)
      .as[(Long, Long, Long, Double)].collect().head
    // 1*2 + 0.75*2 + 0.5*1 = 4.0 -> 4_000_000 micro-units
    assert(r5 == ((5L, 2L, 4000000L, 0.8)), r5.toString)
    val r100 = Analytics.rmst(subj, "dur", "observed", tau = 100L)
      .as[(Long, Long, Long, Double)].collect().head
    // 2 + 1.5 + 1 + 0.5 + 0*92 = 5.0
    assert(r100 == ((100L, 4L, 5000000L, 0.05)), r100.toString)
    val cens = Seq((2L, false), (4L, false)).toDF("dur", "observed")
    val rc = Analytics.rmst(cens, "dur", "observed", tau = 10L)
      .as[(Long, Long, Long, Double)].collect().head
    assert(rc == ((10L, 0L, 10000000L, 1.0)), rc.toString)
  }

  test("pettittTest: scalar replication on a clean level shift; " +
    "constant series clamps p at 1 and breaks ties at smallest k; " +
    "row order never matters") {
    // x = [1,1,1,10,10,10]: 2r̄(1)=4, 2r̄(10)=10; U = [-3,-6,-9,-6,-3]
    val df = Seq((1L, 1.0), (2L, 1.0), (3L, 1.0),
      (4L, 10.0), (5L, 10.0), (6L, 10.0)).toDF("i", "x")
    val got = Analytics.pettittTest(df, "i", "x")
      .as[(Long, Long, Long, Double)].collect().head
    assert(got._1 == 6L && got._2 == 9L && got._3 == 3L)
    val p = BigDecimal(2.0 * math.exp(-6.0 * 81.0 / (216.0 + 36.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got._4 == p, s"p ${got._4} vs $p")
    // shuffled input rows give the identical row (exact integers)
    val got2 = Analytics.pettittTest(
      df.orderBy(rand(7)), "i", "x")
      .as[(Long, Long, Long, Double)].collect().head
    assert(got == got2)
    // constant series: every U_k = 0 -> K = 0 at the SMALLEST k,
    // p = 2*exp(0) clamped to 1
    val flat = Seq((1L, 5.0), (2L, 5.0), (3L, 5.0)).toDF("i", "x")
    val f = Analytics.pettittTest(flat, "i", "x")
      .as[(Long, Long, Long, Double)].collect().head
    assert(f == ((3L, 0L, 1L, 1.0)), f.toString)
    // n < 2: zero rows (no k < n exists)
    assert(Analytics.pettittTest(
      Seq((1L, 5.0)).toDF("i", "x"), "i", "x").count() == 0)
  }

  test("logisticGdMicros: hand-replayed ascent steps in exact micro " +
    "units; balanced data has zero gradient; negative residuals " +
    "round half-AWAY; the report's accuracy is the exact sign test") {
    // one row (x=1, y=1), 2 steps from zero:
    //   it1: z=0, sigma=.5, r=500000 -> g=500000 for both coords
    //   it2: z_pico=1e12, sigma=round6(1/(1+e^-1))=.731059,
    //        r=268941 -> beta=[768941, 768941]
    val one = Seq((1.0, 1L)).toDF("x", "y")
    assert(Analytics.logisticGdMicros(one, Seq("x"), "y", 1).toSeq ==
      Seq(500000L, 500000L))
    assert(Analytics.logisticGdMicros(one, Seq("x"), "y", 2).toSeq ==
      Seq(768941L, 768941L))
    // y=0 flips the residual sign: half-away rounding must mirror
    val zero = Seq((1.0, 0L)).toDF("x", "y")
    assert(Analytics.logisticGdMicros(zero, Seq("x"), "y", 1).toSeq ==
      Seq(-500000L, -500000L))
    // perfectly balanced rows: residuals cancel, beta never moves
    val bal = Seq((1.0, 1L), (1.0, 0L)).toDF("x", "y")
    assert(Analytics.logisticGdMicros(bal, Seq("x"), "y", 5).toSeq ==
      Seq(0L, 0L))
    // report: train on the single positive; test rows score
    // z_pico > 0 -> predict 1 -> y=1 right, y=0 wrong -> acc 0.5
    val frame = Seq((1.0, 1L, "train"), (1.0, 1L, "test"),
      (1.0, 0L, "test")).toDF("x", "y", "split")
    val rep = Analytics.logisticModelReport(frame, Seq("x"), "y",
        "split", iters = 2)
      .as[(Long, Long, Long, Long, Double, Double)].collect().head
    assert(rep == ((1L, 2L, 768941L, 768941L, 1.0, 0.5)),
      rep.toString)
  }

  test("coxPartialGd: one hand-derived gradient step — risk sets, " +
    "Breslow ratio, half-away micro update — lands on the exact " +
    "integer beta") {
    // subjects (dur, observed, x): at beta=0 every w=1, so
    // S0(1)=3, S0(2)=2; S1(1)=1.5, S1(2)=0.5 (x sums over risk sets);
    // grad = (1.0 + 0.0) - (round6(1.5/3) + round6(0.5/2)) = 0.25;
    // lr = 0.05/2 events -> delta = 250000 micros / 40 = 6250 exactly
    val subj = Seq(
      (1L, true, 1.0), (2L, true, 0.0), (3L, false, 0.5)
    ).toDF("dur", "observed", "x")
    val out = Analytics.coxPartialGd(subj, "dur", "observed",
      Seq("x"), iters = 1).collect().head
    assert(out.getAs[Long]("n_subjects") == 3L &&
      out.getAs[Long]("n_events") == 2L)
    assert(out.getAs[Long]("b_x_micros") == 6250L, out.toString)
    // partial log-likelihood at the final beta is negative (2 events,
    // risk sets of 3 and 2)
    assert(out.getAs[Double]("loglik") < 0.0)
  }

  test("coxPartialGd: a constant covariate has zero gradient (the " +
    "ratio IS the covariate), and an all-censored frame never moves " +
    "beta") {
    val const = Analytics.coxPartialGd(
      Seq((1L, true, 0.7), (2L, true, 0.7), (3L, false, 0.7))
        .toDF("dur", "observed", "x"),
      "dur", "observed", Seq("x"), iters = 3).collect().head
    assert(const.getAs[Long]("b_x_micros") == 0L, const.toString)
    val cens = Analytics.coxPartialGd(
      Seq((1L, false, 1.0), (2L, false, 2.0))
        .toDF("dur", "observed", "x"),
      "dur", "observed", Seq("x"), iters = 3).collect().head
    assert(cens.getAs[Long]("b_x_micros") == 0L)
  }

  test("coxPartialGd: a covariate that separates early events from " +
    "late censoring earns a positive hazard coefficient") {
    // high-x subjects all fail fast, low-x subjects all survive:
    // beta must move up and the model must rank hazards accordingly
    val subj = (1 to 10).map(i =>
      if (i <= 5) (i.toLong, true, 2.0)       // early events, x = 2
      else (100L + i, false, 0.1)             // late censoring, x = 0.1
    ).toDF("dur", "observed", "x")
    val out = Analytics.coxPartialGd(subj, "dur", "observed",
      Seq("x"), iters = 3).collect().head
    assert(out.getAs[Long]("b_x_micros") > 0L, out.toString)
  }

  test("bradleyTerry: two players at 3-1 converge to the exact 3:1 " +
    "strength ratio; shares sum to 1") {
    val pairs = (Seq.fill(3)(("A", "B")) :+ (("B", "A")))
      .toDF("winner", "loser")
    val out = Analytics.bradleyTerry(pairs, "winner", "loser", iters = 3)
      .collect().map(r => r.getAs[String]("player") -> r).toMap
    val a = out("A"); val b = out("B")
    assert(a.getAs[Long]("wins") == 3L && a.getAs[Long]("games") == 4L)
    assert(b.getAs[Long]("wins") == 1L && b.getAs[Long]("games") == 4L)
    // MM round 1 from p=1: den = round(4/2) = 2 -> p_A = 1.5,
    // p_B = 0.5; rounds 2-3 are fixpoint no-ops (the unrolled-oracle
    // contract: extra rounds on a converged state change nothing)
    assert(a.getAs[Double]("strength") == 1.5 &&
      b.getAs[Double]("strength") == 0.5)
    assert(a.getAs[Double]("share") == 0.75 &&
      b.getAs[Double]("share") == 0.25)
  }

  test("bradleyTerry: a zero-win player sinks to strength 0 (the MLE " +
    "boundary), and a transitive 3-cycle-free tournament ranks " +
    "players in dominance order") {
    val shut = Analytics.bradleyTerry(
      Seq(("A", "B"), ("A", "B")).toDF("w", "l"), "w", "l", iters = 3)
      .collect().map(r => r.getAs[String]("player") ->
        (r.getAs[Double]("strength"), r.getAs[Double]("share"))).toMap
    assert(shut("B") == ((0.0, 0.0)) && shut("A")._2 == 1.0)
    val chain = Analytics.bradleyTerry(
      Seq(("A", "B"), ("A", "B"), ("B", "C"), ("B", "C"), ("A", "C"),
        ("C", "A")).toDF("w", "l"), "w", "l", iters = 3)
      .collect().map(r => r.getAs[String]("player") ->
        r.getAs[Double]("strength")).toMap
    assert(chain("A") > chain("B") && chain("B") > chain("C"),
      chain.toString)
  }

  test("bradleyTerry: self-pairs and null players are dropped; the " +
    "corpus collapses to cells before any iteration work") {
    val out = Analytics.bradleyTerry(
      Seq(("A", "A"), ("A", null), (null, "B"), ("A", "B"))
        .toDF("w", "l"), "w", "l", iters = 2)
      .collect().map(r => r.getAs[String]("player") ->
        r.getAs[Long]("games")).toMap
    assert(out == Map("A" -> 1L, "B" -> 1L))
  }

  test("dawidSkene: EM learns the reliable rater and OVERRIDES a " +
    "2-of-3 wrong majority; clean consensus items keep their label; " +
    "quality ranks the perfect rater's diagonal above the noisy ones") {
    import spark.implicits._
    // truth: items 1-30 'a', 31-90 'b'. Rater 0 is perfect; raters
    // 1/2 are NOISY on a-items (~50% error each, disjoint sets except
    // item 9 where BOTH err identically) and clean on b-items. On
    // item 9 majority vote says 'b'; DS, having learned rater 0's
    // near-zero b→a confusion against the others' high a→b rates,
    // overrides the majority. (Two nearly-clean raters agreeing
    // would legitimately BEAT one perfect rater — the override only
    // falls out when the correlated raters are measurably noisy,
    // which is exactly DS's value over majority vote.)
    val aErr1 = (1L to 15L).toSet             // rater 1: 50% of a's
    val aErr2 = Set(9L) ++ (16L to 29L).toSet // rater 2: 50%, overlap 9
    val lab = (
      (1L to 30L).map(i => (i, 0L, "a")) ++
        (31L to 90L).map(i => (i, 0L, "b")) ++
      (1L to 30L).map(i =>
        (i, 1L, if (aErr1(i)) "b" else "a")) ++
        (31L to 90L).map(i => (i, 1L, "b")) ++
      (1L to 30L).map(i =>
        (i, 2L, if (aErr2(i)) "b" else "a")) ++
        (31L to 90L).map(i => (i, 2L, "b"))
    ).toDF("item", "rater", "label")
    val out = Analytics.dawidSkene(lab, "item", "rater", "label",
        rounds = 4)
      .collect().map(r => r.getAs[Long]("item") ->
        (r.getAs[String]("ds_label"), r.getAs[Double]("ds_posterior")))
      .toMap
    assert(out.size == 90)
    // the majority-wrong item: DS sides with the learned-reliable
    // rater 0 against the two correlated noisy errors
    assert(out(9L) == (("a", out(9L)._2)) && out(9L)._2 > 0.5,
      s"item 9: ${out(9L)}")
    // every other item keeps its majority label
    (1L to 30L).filter(_ != 9L).foreach(i =>
      assert(out(i)._1 == "a", s"item $i: ${out(i)}"))
    (31L to 90L).foreach(i =>
      assert(out(i)._1 == "b", s"item $i: ${out(i)}"))
    assert(out.values.forall(v => v._2 > 0.0 && v._2 <= 1.0))
    val q = Analytics.dawidSkeneQuality(lab, "item", "rater", "label",
        rounds = 4)
      .collect().map(r => (r.getAs[Long]("annotator"),
        r.getAs[String]("label")) -> r.getAs[Double]("diag_rate"))
      .toMap
    assert(q.size == 6) // 3 raters x 2 classes
    assert(q((0L, "a")) > q((1L, "a")) && q((0L, "a")) > q((2L, "a")),
      q.toString)
    // 7 judgments on one item — past the OLD unstaged 5-factor cap
    // (r17/r18) — now runs through the staged product and lands on
    // the 6-of-7 majority
    val seven = (0L to 5L).map(k => (1L, k, "a"))
      .toDF("item", "rater", "label")
      .unionByName(Seq((1L, 6L, "b")).toDF("item", "rater", "label"))
    val sevenOut = Analytics.dawidSkene(seven, "item", "rater", "label")
      .collect()
    assert(sevenOut.length == 1 &&
      sevenOut.head.getAs[String]("ds_label") == "a")
  }

  test("dawidSkene: deep judgment stacks (r18 verdict #5 — the " +
    "5-per-item cap lifted): 12/item with noisy raters recovers " +
    "truth deterministically; 33/item unanimous runs through the " +
    "staged exponent; 65/item fails loudly") {
    import spark.implicits._
    val classes = Seq("a", "b", "c")
    // 20 items, 12 judgments each; raters 9-11 err deterministically
    // ~40% of the time onto a hash-picked other class
    val lab = (1L to 20L).flatMap { i =>
      val truth = classes((i % 3).toInt)
      (0L to 11L).map { k =>
        val noisy = k >= 9 && (i * 31 + k * 7) % 10 < 4
        val l = if (noisy) classes(((i + k) % 3).toInt) else truth
        (i, k, l)
      }
    }.toDF("item", "rater", "label")
    def run() = Analytics.dawidSkene(lab, "item", "rater", "label")
      .collect().map(r => r.getAs[Long]("item") ->
        ((r.getAs[String]("ds_label"), r.getAs[Double]("ds_posterior"))))
      .toMap
    val out = run()
    assert(out.size == 20)
    (1L to 20L).foreach { i =>
      val truth = classes((i % 3).toInt)
      assert(out(i)._1 == truth && out(i)._2 > 0.9,
        s"item $i: ${out(i)}")
    }
    // determinism: the sorted staged fold pins the result — a second
    // run is bit-identical (posteriors included)
    assert(run() == out)
    // 33 judgments/item: the mantissa rescales ~25+ times and the
    // wrong class truncates to a 0 share (Δ-exponent > 5)
    val deep = (1L to 4L).flatMap(i => (0L to 32L).map(k =>
      (i, k, if (i <= 2) "a" else "b"))).toDF("item", "rater", "label")
    val deepOut = Analytics.dawidSkene(deep, "item", "rater", "label")
      .collect().map(r => r.getAs[Long]("item") ->
        ((r.getAs[String]("ds_label"), r.getAs[Double]("ds_posterior"))))
      .toMap
    (1L to 4L).foreach { i =>
      val truth = if (i <= 2) "a" else "b"
      assert(deepOut(i)._1 == truth && deepOut(i)._2 > 0.99,
        s"item $i: ${deepOut(i)}")
    }
    // r19 ADVICE: with MANY classes sitting at one item's max
    // exponent, the per-item window SUM of decimal(38,0) likelihoods
    // must stay inside the type — the 10³⁰ rescale threshold bounds
    // each post-multiply mantissa by 10³⁶ so even a 100-class sum
    // fits. 12 classes x 24 evenly-spread judgments puts every class
    // at the same (max) exponent with comparable mantissas; a silent
    // overflow would surface as a null (non-ANSI) posterior here.
    val cls12 = (0 until 12).map(c => s"c$c")
    val wide = (1L to 3L).flatMap(i => (0L to 23L).map(k =>
      (i, k, cls12((k % 12).toInt)))).toDF("item", "rater", "label")
    val wideOut = Analytics.dawidSkene(wide, "item", "rater", "label")
      .collect()
    assert(wideOut.length == 3)
    wideOut.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("ds_posterior")),
        "overflowed-to-null posterior")
      val p = r.getAs[Double]("ds_posterior")
      assert(p > 0.0 && p <= 1.0, s"posterior $p")
    }
    // the loud bound now sits at 64 — meaning, not overflow
    val tooDeep = ((0L to 64L).map(k => (1L, k, "a")) :+ ((2L, 0L, "b")))
      .toDF("item", "rater", "label")
    val e = intercept[IllegalArgumentException] {
      Analytics.dawidSkene(tooDeep, "item", "rater", "label").collect()
    }
    assert(e.getMessage.contains("65"))
  }

  test("dawidSkene: a 12-annotator pool at 3 judgments/item runs " +
    "(the old global A <= 5 cap wrongly rejected wide pools); " +
    "unanimous labels are recovered with high posterior") {
    import spark.implicits._
    // 30 items, truth a for 1-15 / b for 16-30; each item judged by
    // the 3 raters (i, i+1, i+2) mod 12 — 12 distinct annotators in
    // the pool, never more than 3 judgments on one item
    val lab = (1L to 30L).flatMap { i =>
      val truth = if (i <= 15L) "a" else "b"
      (0L to 2L).map(d => (i, (i + d) % 12L, truth))
    }.toDF("item", "rater", "label")
    val out = Analytics.dawidSkene(lab, "item", "rater", "label")
      .collect().map(r => r.getAs[Long]("item") ->
        (r.getAs[String]("ds_label"), r.getAs[Double]("ds_posterior")))
      .toMap
    assert(out.size == 30)
    (1L to 30L).foreach { i =>
      val truth = if (i <= 15L) "a" else "b"
      assert(out(i)._1 == truth && out(i)._2 > 0.9, s"item $i: ${out(i)}")
    }
    // the quality readout covers the whole pool: 12 raters x 2 classes
    val q = Analytics.dawidSkeneQuality(lab, "item", "rater", "label")
      .collect()
    assert(q.length == 24)
  }

  test("passAtK: exact falling-factorial values against hand-computed " +
    "binomials; c=0 gives 0, c=n gives 1, k>n gives null; the " +
    "per-task sample bound fails loudly") {
    import spark.implicits._
    // task 1: n=10, c=3 -> pass@1 = 0.3,
    //   pass@5 = 1 - C(7,5)/C(10,5) = 1 - 21/252
    // task 2: n=10, c=0 -> every pass@k = 0
    // task 3: n=10, c=10 -> every pass@k = 1
    // task 4: n=3 -> pass@5/pass@10 null (k > n), pass@1 = 1/3
    val rows =
      (1L to 10L).map(i => (1L, i, i <= 3)) ++
      (1L to 10L).map(i => (2L, i, false)) ++
      (1L to 10L).map(i => (3L, i, true)) ++
      (1L to 3L).map(i => (4L, i, i == 1L))
    val out = Analytics.passAtK(rows.toDF("task", "sample", "ok"),
        "task", col("ok"), ks = Seq(1, 5, 10))
      .collect().map(r => r.getAs[Long]("task") ->
        ((r.getAs[Long]("n_samples"), r.getAs[Long]("n_correct"),
          Option(r.getAs[java.lang.Double]("pass_at_1")),
          Option(r.getAs[java.lang.Double]("pass_at_5")),
          Option(r.getAs[java.lang.Double]("pass_at_10"))))).toMap
    // pass@5(n=10,c=3) = 1 - 21/252 = 0.9166666... -> 0.916667;
    // pass@10 there: m=7 < 10 -> the every-draw-contains-a-pass arm
    assert(out(1L) == ((10L, 3L, Some(0.3), Some(0.916667), Some(1.0))),
      out(1L).toString)
    assert(out(2L) == ((10L, 0L, Some(0.0), Some(0.0), Some(0.0))))
    assert(out(3L) == ((10L, 10L, Some(1.0), Some(1.0), Some(1.0))))
    assert(out(4L) == ((3L, 1L, Some(0.333333), None, None)))
    // a 1001-sample task crosses the exact decimal(38,0) bound
    val big = (1L to 1001L).map(i => (1L, i, true))
      .toDF("task", "sample", "ok")
    intercept[IllegalArgumentException] {
      Analytics.passAtK(big, "task", col("ok"))
    }
    // zero generated samples is a plausible pipeline input: the op
    // returns the empty per-task frame, it does not NPE on the
    // null max-samples read
    val none = Seq.empty[(Long, Long, Boolean)]
      .toDF("task", "sample", "ok")
    assert(Analytics.passAtK(none, "task", col("ok")).count() == 0L)
    // null-as-fail is the STATED semantics (r18 ADVICE): a null
    // outcome counts into n but never into c
    val withNull = Seq((1L, 1L, Some(true)), (1L, 2L, None),
        (1L, 3L, Some(false))).toDF("task", "sample", "ok")
    val nr = Analytics.passAtK(withNull, "task", col("ok"),
      ks = Seq(1)).collect().head
    assert(nr.getAs[Long]("n_samples") == 3L &&
      nr.getAs[Long]("n_correct") == 1L &&
      nr.getAs[Double]("pass_at_1") == 0.333333)
  }
}
