package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class JoinsScalarsSpec extends SparkSpec {
  import spark.implicits._

  test("asOfJoin: latest prior right row, equal-time match, null when none") {
    val left = Seq(
      (1L, 10L, 100L), (2L, 10L, 205L), (3L, 10L, 300L), (4L, 20L, 50L)
    ).toDF("eid", "k", "t")
    val right = Seq(
      (10L, 100L, "a"), (10L, 200L, "b"), (10L, 250L, "c"), (30L, 1L, "z")
    ).toDF("k", "rt", "payload")
    val out = Joins.asOfJoin(left, right, Seq("k"), "t", "rt", Seq("payload"))
      .select("eid", "payload").as[(Long, Option[String])].collect().toMap
    assert(out == Map(
      1L -> Some("a"),   // right row at exactly t=100 matches
      2L -> Some("b"),   // 200 <= 205 < 250
      3L -> Some("c"),   // latest prior
      4L -> None))       // key 20 has no right rows
  }

  test("asOfJoin: payload travels as one row — a newer null is NOT " +
    "back-filled from an older right row") {
    val left = Seq((1L, 10L, 300L)).toDF("eid", "k", "t")
    val right = Seq(
      (10L, 100L, Some("old_a"), Some("old_b")),
      (10L, 200L, Some("new_a"), None) // newer row: b is genuinely null
    ).toDF("k", "rt", "a", "b")
    val out = Joins.asOfJoin(left, right, Seq("k"), "t", "rt", Seq("a", "b"))
      .select("a", "b").as[(Option[String], Option[String])].head()
    // row-wise as-of: both columns from the t=200 row
    assert(out == (Some("new_a"), None))
  }

  test("asOfJoinNearest: forward wins when strictly closer, ties go " +
    "backward, equal time is backward at distance 0, out-of-tolerance " +
    "stays null") {
    val left = Seq((1L, 1L, 100L), (2L, 1L, 300L), (3L, 1L, 1000L),
      (4L, 2L, 50L)).toDF("id", "k", "t")
    val right = Seq((1L, 60L, "v60"), (1L, 130L, "v130"),
      (1L, 280L, "v280"), (1L, 320L, "v320"), (2L, 50L, "v50"))
      .toDF("k", "rt", "v")
    val out = Joins.asOfJoinNearest(left, right, Seq("k"), "t", "rt",
        Seq("v"), toleranceSeconds = 100)
      .select("id", "v", "matched_time", "direction")
      .as[(Long, Option[String], Option[Long], Option[String])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // t=100: backward d=40 vs forward d=30 -> forward
    assert(out(1L) == ((Some("v130"), Some(130L), Some("forward"))))
    // t=300: d=20 both sides -> tie goes backward
    assert(out(2L) == ((Some("v280"), Some(280L), Some("backward"))))
    // t=1000: nothing within 100s either side
    assert(out(3L) == ((None, None, None)), out(3L).toString)
    // equal time: the backward match at distance 0
    assert(out(4L) == ((Some("v50"), Some(50L), Some("backward"))))
  }

  test("asOfJoinTolerance: stale matches null out, fresh ones attach " +
    "with their matched time") {
    val left = Seq((1L, 10L, 100L), (2L, 10L, 500L), (3L, 20L, 100L))
      .toDF("eid", "k", "t")
      .withColumn("t", timestamp_seconds(col("t")))
    val right = Seq((10L, 90L, "a"), (10L, 120L, "b"))
      .toDF("k", "rt", "payload")
      .withColumn("rt", timestamp_seconds(col("rt")))
    val out = Joins.asOfJoinTolerance(left, right, Seq("k"), "t", "rt",
        Seq("payload"), toleranceSeconds = 60)
      .select("eid", "payload", "matched_time")
      .as[(Long, Option[String], Option[java.sql.Timestamp])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((Some("a"),
      Some(new java.sql.Timestamp(90L * 1000))))) // age 10s, fresh
    assert(out(2L) == ((None, None))) // latest match (rt=120) is 380s old
    assert(out(3L) == ((None, None))) // no right rows at all
  }

  test("rangeJoin: equals the naive range-filter join, bins transparent") {
    val events = Seq(
      (1L, 5L, 100L), (2L, 5L, 1000L), (3L, 5L, 5000L), (4L, 6L, 100L)
    ).toDF("eid", "k", "et")
      .withColumn("et", timestamp_seconds(col("et")))
    val ivs = Seq(
      (5L, 0L, 600L, "w1"), (5L, 900L, 6000L, "w2"), (7L, 0L, 9999L, "w3")
    ).toDF("k", "s", "e", "w")
      .withColumn("s", timestamp_seconds(col("s")))
      .withColumn("e", timestamp_seconds(col("e")))
    val naive = events.join(ivs, Seq("k"))
      .filter(col("et") >= col("s") && col("et") < col("e"))
      .select("eid", "w").as[(Long, String)].collect().toSet
    for (bin <- Seq(60L, 500L, 86400L)) {
      val out = Joins.rangeJoin(events, ivs, Seq("k"), "et", "s", "e", bin)
        .select("eid", "w").as[(Long, String)].collect().toSet
      assert(out == naive, s"bin=$bin")
    }
    assert(naive == Set((1L, "w1"), (2L, "w2"), (3L, "w2")))
  }

  test("regexVocabJoin: whole-word, case-insensitive, regex-metachars quoted") {
    val facts = Seq(
      (1L, "gave Aspirin 100mg oral"),
      (2L, "aspirinoid compound"),          // not a word-boundary match
      (3L, "dose of 5+5 units given"),      // metachar term must be quoted
      (4L, "nothing relevant")
    ).toDF("id", "text")
    val vocab = Seq("aspirin", "5+5").toDF("term")
    val out = Joins.regexVocabJoin(facts, vocab, "text", "term")
      .select("id", "term").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "aspirin"), (3L, "5+5")))
  }

  test("semi and anti joins partition the fact table") {
    val fact = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val dim = Seq(1, 3).toDF("k")
    val in = Joins.semi(fact, dim, Seq("k")).select("k").as[Int].collect().toSet
    val outp = Joins.anti(fact, dim, Seq("k")).select("k").as[Int].collect().toSet
    assert(in == Set(1, 3) && outp == Set(2))
  }

  test("fullOuter keeps unmatched rows from both sides") {
    val l = Seq((1, "l1"), (2, "l2")).toDF("k", "lv")
    val r = Seq((2, "r2"), (3, "r3")).toDF("k", "rv")
    val out = Joins.fullOuter(l, r, Seq("k"))
    assert(out.count() == 3)
    assert(out.filter(col("k") === 3).select("lv").first().isNullAt(0))
  }

  test("ageYears: calendar-aware whole years (lubridate semantics)") {
    val df = Seq(
      ("2000-02-29", "2024-02-28"), // day before anniversary -> 23
      ("2000-02-29", "2024-03-01"), // after -> 24
      ("2000-01-15", "2024-01-15")  // exact anniversary -> 24
    ).toDF("birth", "adm")
      .select(Scalars.ageYears(col("birth").cast("date"),
        col("adm").cast("date")).as("age"))
    assert(df.as[Int].collect().toSeq == Seq(23, 24, 24))
  }

  test("toNumeric: R as.numeric semantics — null on malformed, not error") {
    val out = Seq("42.5", "abc", "", "7e2").toDF("s")
      .select(Scalars.toNumeric(col("s")).as("d"))
      .as[Option[Double]].collect()
    assert(out.toSeq == Seq(Some(42.5), None, None, Some(700.0)))
  }

  test("clamp and capOrNull") {
    val df = Seq(-1.0, 3.0, 99.0).toDF("v")
    assert(df.select(Scalars.clamp(col("v"), 0, 6).as("c"))
      .as[Double].collect().toSeq == Seq(0.0, 3.0, 6.0))
    assert(df.select(Scalars.capOrNull(col("v"), 6).as("c"))
      .as[Option[Double]].collect().toSeq == Seq(None, Some(3.0), Some(6.0)))
  }

  test("extractNumber + stripNumber: dose string parsing") {
    val df = Seq("5 mg/hr", "2.5mcg/kg/min", "no dose").toDF("s")
    assert(df.select(Scalars.extractNumber(col("s")).as("n"))
      .as[Option[Double]].collect().toSeq == Seq(Some(5.0), Some(2.5), None))
    assert(df.select(Scalars.stripNumber(col("s")).as("u"))
      .as[String].collect().toSeq == Seq("mg/hr", "mcg/kg/min", "no dose"))
  }

  test("caseWhen: first match wins, default applies") {
    val df = Seq(-5.0, 500.0, 99999.0).toDF("v")
    val out = df.select(Scalars.caseWhen(Seq(
      (col("v") < 0, lit("neg")),
      (col("v") < 1000, lit("small"))), lit("big")).as("band"))
    assert(out.as[String].collect().toSeq == Seq("neg", "small", "big"))
  }

  test("recode: exact-match mapping with default") {
    val df = Seq("White", "BLACK", "Asian").toDF("race")
    val out = df.select(Scalars.recode(col("race"),
      Map("White" -> "white", "Asian" -> "asian"), lit("other")).as("r"))
    assert(out.as[String].collect().toSeq == Seq("white", "other", "asian"))
  }

  test("fallbackIfBlank treats null and empty as missing") {
    val df = Seq(Some("mg"), Some(""), None).toDF("u")
    val out = df.select(
      Scalars.fallbackIfBlank(col("u"), lit("units")).as("x"))
    assert(out.as[String].collect().toSeq == Seq("mg", "units", "units"))
  }

  test("epochToTs and tsToString round-trip") {
    val df = Seq(1700000000L).toDF("epoch")
      .select(Scalars.tsToString(Scalars.epochToTs(col("epoch"))).as("s"))
    assert(df.as[String].collect().head == "2023-11-14 22:13:20")
  }

  private def bruteEditPairs(rows: Seq[(Long, String)], k: Int)
      : Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (i1, s1) <- rows; (i2, s2) <- rows
      if i1 < i2
      d = lev(s1, s2) if d <= k
    } yield (i1, i2, d)).toSet
  }

  test("editDistanceJoin == brute force at k=1 and k=2 (insert/delete/" +
    "substitute, varied lengths)") {
    val rows: Seq[(Long, String)] = Seq(
      1L -> "spark", 2L -> "spork", 3L -> "sparks", 4L -> "park",
      5L -> "sprk", 6L -> "shark", 7L -> "sharky", 8L -> "tables",
      9L -> "table", 10L -> "cable", 11L -> "maple", 12L -> "ample",
      13L -> "appl", 14L -> "apple", 15L -> "apples", 16L -> "dapple",
      17L -> "zzzzzzzz", 18L -> "zzzzzzz")
    val df = rows.toDF("id", "name")
    for (k <- Seq(1, 2)) {
      val got = Joins.editDistanceJoin(df, "id", "name", k)
        .as[(Long, Long, Int)].collect().toSet
      assert(got == bruteEditPairs(rows, k), s"k=$k mismatch")
    }
  }

  test("editDistanceJoin: short stratum — strings below k+1 chars still " +
    "pair correctly") {
    val rows: Seq[(Long, String)] = Seq(
      1L -> "a", 2L -> "b", 3L -> "ab", 4L -> "abc", 5L -> "", 6L -> "ba")
    val df = rows.toDF("id", "name")
    for (k <- Seq(1, 2)) {
      val got = Joins.editDistanceJoin(df, "id", "name", k)
        .as[(Long, Long, Int)].collect().toSet
      assert(got == bruteEditPairs(rows, k), s"k=$k mismatch")
    }
  }

  test("editDistanceJoin: corpus-constant affix stripping makes a " +
    "shared-prefix corpus survive a tight maxBucket at full recall") {
    // The round-9 recall cliff: raw "Customer#%09d" keys share a long
    // constant prefix, so without stripping the only discriminating
    // segment bucket is the one spanning the prefix — 40 members, over
    // any tight cap, and the capped join returned ZERO pairs. With the
    // corpus-constant prefix stripped before segmentation the tails
    // "01".."40" have selective buckets (max 10 members per leading
    // digit), so cap=10 drops nothing and the capped run equals the
    // brute-force pair set exactly.
    val rows: Seq[(Long, String)] =
      (1L to 40L).map(i => i -> f"Customer#$i%09d")
    val df = rows.toDF("id", "name")
    val expect = bruteEditPairs(rows, 1)
    assert(expect.nonEmpty) // adjacent same-digit-count ids differ by 1
    val capped = Joins.editDistanceJoin(df, "id", "name", 1,
      maxBucket = Some(10))
      .as[(Long, Long, Int)].collect().toSet
    assert(capped == expect,
      "capped raw-format run must match brute force after affix strip")
  }

  test("editDistanceJoin: maxBucket drops dense post-strip keys, " +
    "Observation counts DISTINCT dropped keys, survivors unaffected") {
    // Density that survives affix stripping: five "zz…" strings share
    // segment-0 "zz" but "qqqq" breaks the corpus-constant prefix and
    // the varied tails break the suffix, so nothing is stripped. The
    // (0,4,"zz") bucket has 6 members; cap=3 drops it — ONE distinct
    // key (the Observation must say 1, not 6 member rows) — and the
    // two true pairs (zzaa~zzab, zzbb~zzab) route only through that
    // bucket, so the capped run returns the EMPTY set: the documented
    // recall concession, now pinned.
    val rows: Seq[(Long, String)] = Seq(
      1L -> "zzaa", 2L -> "zzbb", 3L -> "zzcc", 4L -> "zzdd",
      5L -> "zzee", 6L -> "zzab", 7L -> "qqqq")
    val df = rows.toDF("id", "name")
    val full = Joins.editDistanceJoin(df, "id", "name", 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(full == bruteEditPairs(rows, 1) && full.size == 2)
    // QueryExecution.observedMetrics in Spark 4.1 does not traverse
    // into the adaptive plan, so pin the metric with AQE off (the
    // production consumer is a QueryExecutionListener / the SQL UI)
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqeWas = spark.conf.get(aqeKey)
    try {
      spark.conf.set(aqeKey, "false")
      val capped = Joins.editDistanceJoin(df, "id", "name", 1,
        maxBucket = Some(3))
      assert(capped.collect().isEmpty,
        "both true pairs route through the dropped dense bucket")
      val dropped = capped.queryExecution.observedMetrics
        .get("edit_join_dropped_keys").map(_.getLong(0))
      assert(dropped.contains(1L),
        s"expected 1 distinct dropped key, got $dropped")
    } finally spark.conf.set(aqeKey, aqeWas)
  }

  test("intervalOverlapJoin == brute-force overlap; half-open borders; " +
    "multi-bin pairs appear exactly once; zero-length matches nothing") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // spans chosen to cross many 10s bins; key 1 vs key 2 never join
    val left = Seq(
      (1L, 10L, 0L, 35L),    // long: crosses 4 bins
      (1L, 11L, 40L, 50L),   // touches right r21 start-at-end
      (1L, 12L, 60L, 60L),   // zero-length
      (2L, 13L, 0L, 100L)
    ).map { case (k, id, s, e) => (k, id, ts(s), ts(e)) }
      .toDF("k", "lid", "ls", "le")
    val right = Seq(
      (1L, 20L, 5L, 25L),    // overlaps lid=10 across 2+ shared bins
      (1L, 21L, 50L, 70L),   // starts exactly at lid=11's end: NO match
      (1L, 22L, 59L, 61L),   // covers the zero-length instant: NO match
      (2L, 23L, 99L, 120L)   // 1-second overlap at the tail
    ).map { case (k, id, s, e) => (k, id, ts(s), ts(e)) }
      .toDF("k", "rid", "rs", "re")
    val got = Joins.intervalOverlapJoin(left, right, Seq("k"),
        "ls", "le", "rs", "re", binSeconds = 10)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    // brute force over the cross product
    val l = left.as[(Long, Long, java.sql.Timestamp, java.sql.Timestamp)]
      .collect()
    val r = right.as[(Long, Long, java.sql.Timestamp, java.sql.Timestamp)]
      .collect()
    val brute = for {
      (lk, lid, ls, le) <- l; (rk, rid, rs, re) <- r
      if lk == rk &&
        math.max(ls.getTime, rs.getTime) < math.min(le.getTime, re.getTime)
    } yield (lid, rid)
    assert(got.sorted == brute.toSeq.sorted, s"got=$got brute=${brute.toSeq}")
    assert(got.size == got.distinct.size, "a pair was emitted twice")
    assert(got.toSet == Set((10L, 20L), (13L, 23L)))
  }

  test("pointInTimeJoin: picks the covering SCD2 version; gap " +
    "histories null the payload; unmatched facts survive with nulls") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val history = Seq(
      // key 1: v1 [100, 200), v2 [200, open)
      (1L, "seg_a", 100L, Some(200L)),
      (1L, "seg_b", 200L, None),
      // key 2: CLOSED [100, 150) then a GAP — no open version
      (2L, "seg_c", 100L, Some(150L))
    ).map { case (k, s, f, t) =>
      (k, s, ts(f"2024-01-01 00:${f / 60}%02d:${f % 60}%02d"),
        t.map(x => ts(f"2024-01-01 00:${x / 60}%02d:${x % 60}%02d")).orNull)
    }.toDF("k", "segment", "valid_from", "valid_to")
    def fact(id: Long, k: Long, sec: Long) =
      (id, k, ts(f"2024-01-01 00:${sec / 60}%02d:${sec % 60}%02d"))
    val facts = Seq(
      fact(10L, 1L, 150L), // inside v1
      fact(11L, 1L, 200L), // exactly at v2.valid_from -> v2
      fact(12L, 1L, 250L), // v2 open
      fact(13L, 2L, 170L), // in the GAP -> null payload
      fact(14L, 2L, 120L), // inside the closed version
      fact(15L, 9L, 120L)  // key with no history at all
    ).toDF("fid", "k", "ft")
    val got = Joins.pointInTimeJoin(facts, history, Seq("k"), "ft",
        "valid_from", "valid_to", Seq("segment"))
      .collect().map(r => r.getLong(0) ->
        Option(r.get(3)).map(_.toString)).toMap
    assert(got == Map(10L -> Some("seg_a"), 11L -> Some("seg_b"),
      12L -> Some("seg_b"), 13L -> None, 14L -> Some("seg_c"),
      15L -> None), got.toString)
  }

  test("epsilonDistanceJoin: equals brute force, duplicate-free, " +
    "includes the boundary and cell-edge pairs") {
    // deterministic scatter incl. exact-boundary pair (dist == eps) and
    // a pair straddling a grid-cell edge
    val pts = (1 to 60).map(i =>
      (i.toLong, (i * 17 % 50).toDouble / 3.0, (i * 31 % 50).toDouble / 3.0))
    val left = (pts :+ ((100L, 0.0, 0.0)) :+ ((101L, 2.999, 0.0)))
      .toDF("lid", "lx", "ly")
    val right = (pts.map { case (i, x, y) => (i + 1000L, x, y) } :+
      ((200L, 1.5, 0.0)) :+ ((201L, 3.001, 0.0)))
      .toDF("rid", "rx", "ry")
    val eps = 1.5
    val got = Joins.epsilonDistanceJoin(left, right,
        "lx", "ly", "rx", "ry", eps)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    val l = left.as[(Long, Double, Double)].collect()
    val r = right.as[(Long, Double, Double)].collect()
    val brute = for {
      (lid, lx, ly) <- l; (rid, rx, ry) <- r
      if (lx - rx) * (lx - rx) + (ly - ry) * (ly - ry) <= eps * eps
    } yield (lid, rid)
    assert(got.sorted == brute.toSeq.sorted)
    assert(got.size == got.distinct.size, "a pair was emitted twice")
    // boundary: (0,0)-(1.5,0) at exactly eps is IN;
    // cell-edge: 2.999 vs 3.001 cross the cell-2 boundary and match
    assert(got.contains((100L, 200L)) && got.contains((101L, 201L)))
  }

  test("jaro / jaro-winkler: hand-derived reference values incl. the " +
    "DuckDB-pinned edge cases (bytes, integer transposition halving, " +
    "window clamp, >0.7 boost gate, 4-byte prefix cap, empty → 0)") {
    import graft.functions.NativeExpressions.{jaro_sim, jaro_winkler_sim}
    // every expected value was probed against DuckDB 1.x
    val cases = Seq(
      // (a, b, jaro, jw)
      ("", "", 0.0, 0.0),                  // DuckDB: both-empty is 0
      ("a", "", 0.0, 0.0),
      ("a", "a", 1.0, 1.0),                // window clamps to 0, not −1
      ("ab", "ba", 0.0, 0.0),              // window 0: aligned-only
      ("martha", "marhta", 0.9444444444444445, 0.9611111111111111),
      ("dixon", "dicksonx", 0.7666666666666666, 0.8133333333333332),
      ("duane", "dwayne", 0.8222222222222223, 0.8400000000000001),
      ("jellyfish", "smellyfish", 0.8962962962962964, 0.8962962962962964),
      ("aaaaaa", "aaaaab", 0.888888888888889, 0.9333333333333333), // cap 4
      ("abcdxxxxxx", "abcdyyyyyy", 0.6, 0.6), // jaro ≤ 0.7 → NO boost
      ("abcdefxxxxxx", "abcdefyyyy", 0.7000000000000001,
        0.8200000000000001),               // just over the gate → boost
      ("abcdefgh", "bcadefgh", 0.9583333333333334, 0.9583333333333334),
      // ^ 3 raw mismatches halve to 1 (integer), not 1.5
      ("aéb", "aéc", 0.8333333333333334, 0.8833333333333334),
      // ^ BYTE view: é is 2 bytes, so these are 4-byte strings
      ("Customer#000000001", "Customer#000000002",
        0.9629629629629629, 0.9777777777777777))
    val got = cases.map { case (a, b, _, _) => (a, b) }
      .toDF("a", "b")
      .select(jaro_sim(col("a"), col("b")),
        jaro_winkler_sim(col("a"), col("b")))
      .as[(Double, Double)].collect()
    cases.zip(got).foreach { case ((a, b, ej, ejw), (gj, gjw)) =>
      assert(gj == ej, s"jaro('$a','$b'): got $gj want $ej")
      assert(gjw == ejw, s"jw('$a','$b'): got $gjw want $ejw")
    }
    // null propagation
    val n = Seq((Some("x"), Option.empty[String])).toDF("a", "b")
      .select(jaro_winkler_sim(col("a"), col("b"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("fuzzyMatchJoin == brute force within blocks; distinct-first " +
    "collapses duplicate rows; byte-lexicographic pair order") {
    import graft.functions.NativeExpressions.jaroWinklerRef
    val rows = Seq("red bolt", "red bolts", "rad bolt", "blue bolt",
      "red gear", "rad gear", "reed gear", "blue gear",
      "red bolt", "red bolt", "rad gear") // dupes must collapse
    val df = rows.toDF("name")
    val got = Joins.fuzzyMatchJoin(df, "name",
        n => element_at(split(n, " "), -1), threshold = 0.85)
      .as[(String, String, Double)].collect().toSet
    val vocab = rows.distinct
    val brute = (for {
      a <- vocab; b <- vocab
      if a < b && a.split(" ").last == b.split(" ").last
      s = jaroWinklerRef(a, b)
      // HALF_UP to mirror Spark's round() — math.rint is HALF_EVEN
      // and would flake on an exact 0.5-ulp boundary (round-10 ADVICE)
      r = BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble if r >= 0.85
    } yield (a, b, r)).toSet
    assert(got == brute && got.nonEmpty)
    assert(got.forall { case (a, b, _) => a < b })
  }

  test("fuzzyMatchJoin: maxBucket drops an oversized block WHOLE, " +
    "Observation counts DISTINCT dropped blocks, survivors unaffected") {
    val rows = (1 to 6).map(i => s"v$i bolt") ++
      Seq("red gear", "reed gear")
    val df = rows.toDF("name")
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqeWas = spark.conf.get(aqeKey)
    try {
      spark.conf.set(aqeKey, "false")
      val capped = Joins.fuzzyMatchJoin(df, "name",
        n => element_at(split(n, " "), -1), threshold = 0.85,
        maxBucket = Some(4))
      // collect on the DataFrame itself: .as[...] would wrap a FRESH
      // QueryExecution and the observed metric would never populate
      val pairs = capped.collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(pairs == Set(("red gear", "reed gear")),
        s"bolt block (6 > 4) must vanish whole, got $pairs")
      val dropped = capped.queryExecution.observedMetrics
        .get("fuzzy_join_dropped_blocks").map(_.getLong(0))
      assert(dropped.contains(1L),
        s"expected 1 distinct dropped block, got $dropped")
    } finally spark.conf.set(aqeKey, aqeWas)
  }
}
