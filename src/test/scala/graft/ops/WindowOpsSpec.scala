package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WindowOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("fillDownUp: LOCF then backfill of leading nulls per group") {
    val df = Seq(
      ("e1", ts("2024-01-01 00:00:00"), Option.empty[Double]), // leading null -> backfill 1.0
      ("e1", ts("2024-01-01 01:00:00"), Some(1.0)),
      ("e1", ts("2024-01-01 02:00:00"), Option.empty[Double]), // -> LOCF 1.0
      ("e1", ts("2024-01-01 03:00:00"), Some(3.0)),
      ("e2", ts("2024-01-01 00:00:00"), Option.empty[Double])  // all-null group stays null
    ).toDF("enc", "t", "v")
    val out = WindowOps.fillDownUp(df, Seq("enc"), Seq(col("t")), Seq("v"))
      .orderBy("enc", "t").select("v").as[Option[Double]].collect()
    assert(out.toSeq == Seq(Some(1.0), Some(1.0), Some(1.0), Some(3.0), None))
  }

  test("fillDown: plain LOCF leaves leading nulls") {
    val df = Seq(
      ("e1", 1, Option.empty[String]),
      ("e1", 2, Some("a")),
      ("e1", 3, Option.empty[String])
    ).toDF("enc", "seq", "v")
    val out = WindowOps.fillDown(df, Seq("enc"), Seq(col("seq")), Seq("v"))
      .orderBy("seq").select("v").as[Option[String]].collect()
    assert(out.toSeq == Seq(None, Some("a"), Some("a")))
  }

  test("leadEpisodes: stop = next event time, null for last per group") {
    val df = Seq(
      ("e1", ts("2024-01-01 00:00:00")),
      ("e1", ts("2024-01-01 02:00:00")),
      ("e2", ts("2024-01-01 01:00:00"))
    ).toDF("enc", "t")
    val out = WindowOps.leadEpisodes(df, Seq("enc"), "t", "stop")
      .orderBy("enc", "t")
      .select("stop").as[Option[java.sql.Timestamp]].collect()
    assert(out.toSeq == Seq(Some(ts("2024-01-01 02:00:00")), None, None))
  }

  test("dedupKeepLast: keeps last row in order with deterministic tiebreak") {
    val df = Seq(
      ("p1", 1, "old"), ("p1", 2, "new"),
      ("p2", 5, "only"),
      ("p3", 7, "a"), ("p3", 7, "b") // tie on order col -> tiebreak needed
    ).toDF("pid", "seq", "v")
    // tiebreak on v: keep max v for equal seq, like R's fromLast after a
    // stable arrange on (seq, v)
    val out = WindowOps.dedupKeepLast(df, Seq("pid"), Seq(col("seq"), col("v")))
      .orderBy("pid").select("pid", "v").as[(String, String)].collect()
    assert(out.toSeq == Seq(("p1", "new"), ("p2", "only"), ("p3", "b")))
  }

  test("dedupKeepFirst: keeps first row in order") {
    val df = Seq(("p1", 1, "first"), ("p1", 2, "later")).toDF("pid", "seq", "v")
    val out = WindowOps.dedupKeepFirst(df, Seq("pid"), Seq(col("seq")))
      .select("v").as[String].collect()
    assert(out.toSeq == Seq("first"))
  }

  test("resampleLocf: aligned hourly grid, latest value at-or-before " +
    "each instant, null before first observation") {
    val df = Seq(
      (1L, ts("2024-01-01 00:30:00"), 10.0),
      (1L, ts("2024-01-01 02:00:00"), 20.0), // exactly on a grid point
      (1L, ts("2024-01-01 03:10:00"), 30.0),
      (2L, ts("2024-01-01 05:45:00"), 7.0)
    ).toDF("user_id", "ts", "value")
    val out = WindowOps.resampleLocf(df, Seq("user_id"), "ts",
        Seq("value"), stepSeconds = 3600)
      .as[(Long, java.sql.Timestamp, Option[Double])].collect()
      .map { case (u, t, v) => (u, t.toString, v) }.toSet
    assert(out == Set(
      // user 1: grid starts at the truncated hour of the first obs and
      // ends at the last obs (04:00 > 03:10 is never emitted)
      (1L, "2024-01-01 00:00:00.0", None), // before first observation
      (1L, "2024-01-01 01:00:00.0", Some(10.0)),
      (1L, "2024-01-01 02:00:00.0", Some(20.0)), // on-instant obs attaches
      (1L, "2024-01-01 03:00:00.0", Some(20.0)), // 03:10 obs is later
      // user 2: single obs → one grid point at its truncated hour
      (2L, "2024-01-01 05:00:00.0", None)
    ), out.toString)
  }

  test("sessionize: new session when gap exceeds threshold") {
    val df = Seq(
      ("u1", ts("2024-01-01 00:00:00")),
      ("u1", ts("2024-01-01 00:10:00")),  // 600s gap, same session at 900s gap cap
      ("u1", ts("2024-01-01 01:00:00")),  // 3000s gap -> new session
      ("u2", ts("2024-01-01 00:00:00"))
    ).toDF("uid", "t")
    val out = WindowOps.sessionize(df, Seq("uid"), "t", gapSeconds = 900)
      .orderBy("uid", "t").select("session_id").as[Long].collect()
    assert(out.toSeq == Seq(1L, 1L, 2L, 1L))
  }

  test("timeWeightedAvg: LOCF step weighting, null obs and last obs " +
       "carry no weight, zero-span key reports null") {
    val df = Seq(
      (1L, "u", ts("2024-01-01 00:00:00"), Some(10.0)), // 10s at 10
      (2L, "u", ts("2024-01-01 00:00:10"), Some(20.0)), // 20s at 20
      (3L, "u", ts("2024-01-01 00:00:30"), Option.empty[Double]), // no weight
      (4L, "u", ts("2024-01-01 00:00:40"), Some(40.0)), // last: no weight
      (5L, "v", ts("2024-01-01 00:00:00"), Some(7.0))   // single event
    ).toDF("eid", "uid", "t", "v")
    val out = WindowOps.timeWeightedAvg(df, Seq("uid"), "t",
        Seq(col("eid")), "v")
      .select("uid", "twa", "span_seconds", "n_events")
      .as[(String, Option[Double], Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // (10*10 + 20*20) / 40 = 12.5
    assert(out("u") == ((Some(12.5), 40L, 4L)))
    assert(out("v") == ((None, 0L, 1L)))
  }

  test("rollingMeans: trailing row frame and trailing time frame") {
    val df = Seq(
      // user 1: 00:00 v=1, 00:30 v=3, 01:15 v=null, 01:20 v=5
      (1L, "u1", ts("2024-01-01 00:00:00"), Some(1.0)),
      (2L, "u1", ts("2024-01-01 00:30:00"), Some(3.0)),
      (3L, "u1", ts("2024-01-01 01:15:00"), Option.empty[Double]),
      (4L, "u1", ts("2024-01-01 01:20:00"), Some(5.0)),
      // user 2: isolated row
      (5L, "u2", ts("2024-01-01 00:00:00"), Some(7.0))
    ).toDF("eid", "uid", "t", "v")
    val out = WindowOps.rollingMeans(df, Seq("uid"), "t", Seq(col("eid")),
        "v", nRows = 2, rangeSeconds = 3600)
      .orderBy("eid")
      .select("roll_rows_avg", "roll_time_avg")
      .as[(Option[Double], Option[Double])].collect().toSeq
    assert(out == Seq(
      (Some(1.0), Some(1.0)),   // first row: only itself
      (Some(2.0), Some(2.0)),   // rows {1,3}; time {00:00,00:30}
      (Some(3.0), Some(3.0)),   // rows {3,null} -> 3; time {00:30,null}
      (Some(5.0), Some(4.0)),   // rows {null,5} -> 5; time {00:30,null,5}
      (Some(7.0), Some(7.0))))  // other key unaffected
  }

  test("rollingMeans: simultaneous events are tie-insensitive in the " +
       "time frame but ordered by tiebreak in the row frame") {
    val df = Seq(
      (1L, "u", ts("2024-01-01 00:00:00"), 2.0),
      (2L, "u", ts("2024-01-01 00:00:00"), 4.0) // same instant
    ).toDF("eid", "uid", "t", "v")
    val out = WindowOps.rollingMeans(df, Seq("uid"), "t", Seq(col("eid")),
        "v", nRows = 1, rangeSeconds = 10)
      .orderBy("eid")
      .select("roll_rows_avg", "roll_time_avg")
      .as[(Double, Double)].collect().toSeq
    // row frame (1 row) sees only itself; RANGE frame at an equal order
    // value contains BOTH rows for both rows
    assert(out == Seq((2.0, 3.0), (4.0, 3.0)))
  }

  test("ewma: per-key recurrence s1=v1, si=a*vi+(1-a)*s(i-1), each " +
    "step rounded; cap bounds the per-key array observably") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, 1.0),
      (1L, ts("2024-01-01 00:01:00"), 11L, 2.0),
      (1L, ts("2024-01-01 00:02:00"), 12L, 3.0),
      (2L, ts("2024-01-01 00:00:00"), 20L, 5.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = WindowOps.ewma(df, Seq("user_id"), "ts", "event_id",
        "value", alpha = 0.3)
      .as[(Long, Long, Double)].collect().toSet
    // s1=1.0; s2=0.3*2+0.7*1=1.3; s3=round(0.3*3+0.7*1.3,6)=1.81
    assert(out == Set((1L, 10L, 1.0), (1L, 11L, 1.3), (1L, 12L, 1.81),
      (2L, 20L, 5.0)))
    // cap keeps the FIRST events by time; drop count observable
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqeWas = spark.conf.get(aqeKey)
    try {
      spark.conf.set(aqeKey, "false")
      val capped = WindowOps.ewma(df, Seq("user_id"), "ts", "event_id",
        "value", alpha = 0.3, maxEventsPerKey = Some(2))
      val got = capped.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == Set((1L, 10L, 1.0), (1L, 11L, 1.3), (2L, 20L, 5.0)))
      val dropped = capped.queryExecution.observedMetrics
        .get("ewma_dropped_events").map(_.getLong(0))
      assert(dropped.contains(1L), s"got $dropped")
    } finally spark.conf.set(aqeKey, aqeWas)
  }

  test("resampleInterp: midpoint interpolation, exact-hit passthrough, " +
    "leading-edge null") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val obs = Seq(
      (1L, ts("2024-01-01 00:00:00"), 0.0),
      (1L, ts("2024-01-01 02:00:00"), 100.0),
      (2L, ts("2024-01-01 00:30:00"), 10.0),
      (2L, ts("2024-01-01 01:30:00"), 20.0)
    ).toDF("user_id", "ts", "value")
    val got = WindowOps.resampleInterp(obs, Seq("user_id"), "ts",
        "value", stepSeconds = 3600)
      .as[(Long, java.sql.Timestamp, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, ts("2024-01-01 00:00:00"))) == Some(0.0))   // hit
    assert(got((1L, ts("2024-01-01 01:00:00"))) == Some(50.0))  // mid
    assert(got((1L, ts("2024-01-01 02:00:00"))) == Some(100.0))
    assert(got((2L, ts("2024-01-01 00:00:00"))) == None)        // leading
    assert(got((2L, ts("2024-01-01 01:00:00"))) == Some(15.0))  // frac .5
    assert(got.size == 5)
  }

  test("cusum: hand-computed run with reset-to-zero and alarm; " +
    "below-drift stream stays at zero") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val df = Seq(
      (1L, ts(1), 1L, 100.0), (2L, ts(2), 1L, 100.0),
      (3L, ts(3), 1L, 10.0), (4L, ts(4), 1L, 200.0),
      (5L, ts(5), 1L, 400.0),
      (6L, ts(1), 2L, 5.0), (7L, ts(2), 2L, 5.0) // never accumulates
    ).toDF("event_id", "ts", "user_id", "value")
    val got = WindowOps.cusum(df, Seq("user_id"), "ts", "event_id",
        "value", target = 50.0, slack = 10.0, threshold = 300.0)
      .collect().map(r => r.getLong(1) ->
        (r.getDouble(2), r.getBoolean(3))).toMap
    // s = max(0, s + x - 60): 40, 80, 30, 170, 510(alarm)
    assert(got(1L) == ((40.0, false)))
    assert(got(2L) == ((80.0, false)))
    assert(got(3L) == ((30.0, false)))
    assert(got(4L) == ((170.0, false)))
    assert(got(5L) == ((510.0, true)))
    assert(got(6L) == ((0.0, false)) && got(7L) == ((0.0, false)))
  }

  test("rateLimit: hand-computed token bucket — full start, refill " +
    "cap, burst denial, fractional refill admits later") {
    def ts(sec: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 00:${sec / 60}%02d:${sec % 60}%02d")
    // capacity 2, refill 0.1/s
    val df = Seq(
      (1L, ts(0), 1L),   // full bucket: avail 2, admit, tok 1
      (2L, ts(1), 1L),   // +0.1 -> 1.1, admit, tok 0.1
      (3L, ts(2), 1L),   // +0.1 -> 0.2, DENY, tok 0.2
      (4L, ts(10), 1L),  // +0.8 -> 1.0, admit (>=1), tok 0.0
      (5L, ts(60), 1L),  // +5.0 capped at 2, admit, tok 1
      (6L, ts(0), 2L)    // second key independent: admit, tok 1
    ).toDF("event_id", "ts", "user_id")
    val got = WindowOps.rateLimit(df, Seq("user_id"), "ts", "event_id",
        capacity = 2, refillPerSec = 0.1)
      .collect().map(r => r.getLong(1) ->
        ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got(1L) == ((1.0, true)), got.toString)
    assert(got(2L) == ((0.1, true)))
    assert(got(3L) == ((0.2, false)))
    assert(got(4L) == ((0.0, true)))
    assert(got(5L) == ((1.0, true)))
    assert(got(6L) == ((1.0, true)))
  }

  test("rollingZscore: spike flagged against trailing context; " +
    "warm-up rows and zero-variance windows yield null scores") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // 6 steady values 10.0 then a spike 20.0
    val df = ((1 to 6).map(i => (i.toLong, ts(i), 1L, 10.0)) :+
      ((7L, ts(7), 1L, 20.0))).toDF("event_id", "ts", "user_id", "value")
    val got = WindowOps.rollingZscore(df, Seq("user_id"), "ts",
        "event_id", "value", lookback = 10, zThreshold = 3.0,
        minObs = 4)
      .collect().map(r => r.getLong(1) -> ((r.getLong(3),
        Option(r.get(6)).map(_.asInstanceOf[Double]),
        r.getBoolean(7)))).toMap
    // rows 1-4: fewer than minObs trailing points -> null score
    assert(got(1L) == ((0L, None, false)), got.toString)
    assert(got(4L) == ((3L, None, false)))
    // row 5: 4 identical trailing values -> std 0 -> null, no flag
    assert(got(5L) == ((4L, None, false)))
    // row 7: trailing window all 10.0 -> std 0 -> null even for the
    // spike (zero-variance context cannot score); no false flag
    assert(got(7L) == ((6L, None, false)))
    // a varying context DOES flag the spike: alternate 9/11 then 20
    val varied = ((1 to 6).map(i =>
      (i.toLong, ts(i), 2L, if (i % 2 == 0) 11.0 else 9.0)) :+
      ((7L, ts(7), 2L, 20.0))).toDF("event_id", "ts", "user_id", "value")
    val g2 = WindowOps.rollingZscore(varied, Seq("user_id"), "ts",
        "event_id", "value", lookback = 10, zThreshold = 3.0,
        minObs = 4)
      .collect().map(r => r.getLong(1) ->
        ((Option(r.get(6)).map(_.asInstanceOf[Double]),
          r.getBoolean(7)))).toMap
    // trailing for row 7: {9,11,9,11,9,11} mean 10 var 1 std 1 -> z=10
    assert(g2(7L) == ((Some(10.0), true)), g2.toString)
    // in-context rows are not flagged (|z| = 1)
    assert(g2(6L)._2 == false)
  }

  test("holt: hand-computed level/trend/forecast; a linear ramp is " +
    "tracked with positive trend") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val df = Seq(
      (1L, ts(1), 1L, 10.0), (2L, ts(2), 1L, 20.0), (3L, ts(3), 1L, 30.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val got = WindowOps.holt(df, Seq("user_id"), "ts", "event_id",
        "value", alpha = 0.5, beta = 0.3)
      .collect().map(r => r.getLong(1) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    // e1: l=10, b=0, f=10
    // e2: l=.5*20+.5*(10+0)=15; b=.3*(15-10)+.7*0=1.5; f=16.5
    // e3: l=.5*30+.5*(15+1.5)=23.25; b=.3*8.25+.7*1.5=3.525; f=26.775
    assert(got(1L) == ((10.0, 0.0, 10.0)), got.toString)
    assert(got(2L) == ((15.0, 1.5, 16.5)))
    assert(got(3L) == ((23.25, 3.525, 26.775)))
  }

  test("bestChangepoint: a clean step splits exactly at the step with " +
    "gain = total SSE; flat series ties to the earliest split; short " +
    "keys yield no row") {
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // user 1: step 1->9 at index 5; user 2: flat; user 3: too short
    val df = ((1 to 10).map(i =>
        (i.toLong, t(i), 1L, if (i <= 5) 1.0 else 9.0)) ++
      (1 to 10).map(i => (100L + i, t(i), 2L, 7.0)) ++
      (1 to 3).map(i => (200L + i, t(i), 3L, 1.0 * i)))
      .toDF("event_id", "ts", "user_id", "value")
    val got = WindowOps.bestChangepoint(df, Seq("user_id"), "ts",
        "event_id", "value", minSeg = 2)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // total SSE for user 1: mean 5, 10*16 = 160; two-segment cost 0
    assert(got(1L) == ((5L, 5L, 160.0)), got(1L).toString)
    // flat: every split costs the same (0 gain) -> earliest (minSeg)
    assert(got(2L) == ((2L, 102L, 0.0)), got(2L).toString)
    assert(!got.contains(3L), "3 points < 2*minSeg must yield no row")
  }

  test("rollingMadAnomaly: lower-median frames flag the spike against " +
    "a zero-MAD baseline; the spike in a later frame doesn't flag " +
    "its neighbors") {
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val df = Seq(
      (1L, t(1), 1L, 10.0), (2L, t(2), 1L, 10.0), (3L, t(3), 1L, 10.0),
      (4L, t(4), 1L, 100.0), (5L, t(5), 1L, 10.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val got = WindowOps.rollingMadAnomaly(df, Seq("user_id"), "ts",
        "event_id", "value", lookback = 3, k = 3)
      .collect().map(r => r.getLong(1) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getBoolean(5)))).toMap
    // frames (sorted): e4 sees [10,10,100] -> lower med 10, MAD 0,
    // |100-10| > 0 -> anomaly; e5 sees [10,10,100] with v=10 -> not
    assert(got(4L) == ((100.0, 10.0, 0.0, true)), got(4L).toString)
    assert(got.filter(_._2._4).keySet == Set(4L), got.toString)
    // even frame (e2): lower median of [10,10] is element 1 = 10
    assert(got(2L) == ((10.0, 10.0, 0.0, false)))
  }

  test("holtSeasonal: alternating hourly pattern deseasonalizes to a " +
    "constant (zero trend, fitted == original); exact .5-micro-unit " +
    "offsets round half-AWAY-from-zero in both signs") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // values 10/20 alternating by hour over two days: h0 mean 10,
    // h1 mean 20, overall 15 -> offsets -5/+5; deseasonalized series
    // is constant 15 -> level 15, trend 0, fitted = 15 + offset
    val df = Seq(
      (1L, t("2024-01-01 00:00:00"), 1L, 10.0),
      (2L, t("2024-01-01 01:00:00"), 1L, 20.0),
      (3L, t("2024-01-02 00:00:00"), 1L, 10.0),
      (4L, t("2024-01-02 01:00:00"), 1L, 20.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val got = WindowOps.holtSeasonal(df, Seq("user_id"), "ts",
        "event_id", "value", alpha = 0.5, beta = 0.3)
      .collect().map(r => r.getLong(1) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(got(1L) == ((15.0, 0.0, -5.0, 10.0)), got.toString)
    assert(got(2L) == ((15.0, 0.0, 5.0, 20.0)))
    assert(got(3L) == ((15.0, 0.0, -5.0, 10.0)))
    assert(got(4L) == ((15.0, 0.0, 5.0, 20.0)))
    // structurally half-way offsets: one value per hour, 0.000001 vs
    // 0: overall mean 0.0000005 -> offsets are EXACTLY +-0.5
    // micro-units; integer half-away rounding must give +-0.000001
    // (a double-rounding path is what split the engines at sf0.01)
    val hw = Seq(
      (1L, t("2024-01-01 00:00:00"), 1L, 0.000001),
      (2L, t("2024-01-01 01:00:00"), 1L, 0.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val seas = WindowOps.holtSeasonal(hw, Seq("user_id"), "ts",
        "event_id", "value", alpha = 0.5, beta = 0.3)
      .collect().map(r => r.getLong(1) -> r.getDouble(4)).toMap
    assert(seas == Map(1L -> 0.000001, 2L -> -0.000001), seas.toString)
  }

  test("intervalUnion: an early long interval swallowing later short " +
    "ones stays ONE episode (prefix-max, not lag); touching " +
    "intervals merge; disjoint split; keys independent") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      // key a: [0,10] swallows [2,3] and [4,5]; [10,12] TOUCHES ->
      // one episode [0,12]; [15,16] separate
      ("a", ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00")),
      ("a", ts("2024-01-01 00:02:00"), ts("2024-01-01 00:03:00")),
      ("a", ts("2024-01-01 00:04:00"), ts("2024-01-01 00:05:00")),
      ("a", ts("2024-01-01 00:10:00"), ts("2024-01-01 00:12:00")),
      ("a", ts("2024-01-01 00:15:00"), ts("2024-01-01 00:16:00")),
      // key b: independent
      ("b", ts("2024-01-01 00:02:30"), ts("2024-01-01 00:03:30"))
    ).toDF("k", "s", "e")
    val got = WindowOps.intervalUnion(df, Seq("k"), "s", "e")
      .select("k", "episode", "episode_start", "episode_end",
        "n_intervals")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    def us(s: String) = ts(s).getTime * 1000L
    assert(got == Set(
      ("a", 1L, us("2024-01-01 00:00:00"), us("2024-01-01 00:12:00"), 4L),
      ("a", 2L, us("2024-01-01 00:15:00"), us("2024-01-01 00:16:00"), 1L),
      ("b", 1L, us("2024-01-01 00:02:30"), us("2024-01-01 00:03:30"), 1L)),
      got.toString)
    // inverted intervals are dropped, not corrupting episodes
    val inv = Seq(("a", ts("2024-01-01 00:05:00"),
      ts("2024-01-01 00:01:00"))).toDF("k", "s", "e")
    assert(WindowOps.intervalUnion(inv, Seq("k"), "s", "e").count() == 0)
  }
}
