package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSpec

/** ScalaCheck invariants over the window operators (SURVEY.md §5.4):
  * generated event sets, not hand-picked fixtures. Sample counts stay
  * small because every sample is a Spark job. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(12).withWorkers(1)

  private def check(name: String)(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, s"$name: $r")
  }

  private val eventsGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 25)
    evs <- Gen.listOfN(n, for {
      user <- Gen.choose(1L, 3L)
      ts <- Gen.choose(0L, 10000L)
    } yield (user, ts))
  } yield evs

  test("leadEpisodes: episodes per user never overlap; stop null only on last") {
    check("episode-non-overlap")(Prop.forAll(eventsGen) { evs =>
      val df = evs.zipWithIndex
        .map { case ((u, t), i) => (i.toLong, u, t) }
        .toDF("event_id", "user_id", "ts")
      val eps = WindowOps.leadEpisodes(df, Seq("user_id"), "ts", "stop_ts",
          Seq(col("event_id")))
        .select("user_id", "ts", "stop_ts", "event_id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3)))
      eps.groupBy(_._1).forall { case (_, rows) =>
        val sorted = rows.sortBy(r => (r._2, r._4))
        // exactly one open episode per user, and it is the last
        sorted.count(_._3.isEmpty) == 1 && sorted.last._3.isEmpty &&
        // each stop equals the next row's start -> intervals cannot overlap
        sorted.sliding(2).forall {
          case Array(a, b) => a._3.contains(b._2)
          case _ => true
        }
      }
    })
  }

  test("fillDownUp is idempotent and fills everything when any value exists") {
    val gen = for {
      n <- Gen.choose(1, 20)
      vs <- Gen.listOfN(n, Gen.option(Gen.choose(0, 100)))
    } yield vs
    check("fill-idempotent")(Prop.forAll(gen) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("event_id", "v")
        .withColumn("user_id", lit(1L))
      def fill(d: org.apache.spark.sql.DataFrame) =
        WindowOps.fillDownUp(d, Seq("user_id"), Seq(col("event_id")), Seq("v"))
      val once = fill(df).orderBy("event_id")
        .select("v").as[Option[Int]].collect().toSeq
      val twice = fill(fill(df)).orderBy("event_id")
        .select("v").as[Option[Int]].collect().toSeq
      once == twice &&
        (vs.forall(_.isEmpty) || once.forall(_.nonEmpty))
    })
  }

  test("nearDuplicates == brute-force verified pairs on generated corpora") {
    // corpora of near-dup groups (high jaccard, miss prob ~1e-12 at
    // 16 bands) + unrelated docs; LSH+verify must equal brute force
    val wordPool = (0 until 60).map(i => s"w$i")
    val corpusGen: Gen[Seq[(Long, String)]] = for {
      nGroups <- Gen.choose(1, 4)
      groups <- Gen.listOfN(nGroups, for {
        len <- Gen.choose(12, 24)
        idx <- Gen.listOfN(len, Gen.choose(0, wordPool.size - 1))
        dupCount <- Gen.choose(2, 3)
      } yield (idx.map(wordPool), dupCount))
      loners <- Gen.listOfN(3, Gen.listOfN(15,
        Gen.choose(0, wordPool.size - 1)).map(_.map(i => s"z$i")))
    } yield {
      var id = -1L
      val dups = groups.flatMap { case (words, n) =>
        (0 until n).map { k =>
          id += 1
          // one-word tail tweak keeps jaccard >= ~0.85
          (id, (words :+ s"tail$k").mkString(" "))
        }
      }
      val lone = loners.map { ws => id += 1; (id, ws.mkString(" ")) }
      dups ++ lone
    }
    check("neardup-brute-equiv")(Prop.forAll(corpusGen) { corpus =>
      val df = corpus.toDF("doc_id", "text")
      val lsh = graft.text.Dedup.nearDuplicates(df, "doc_id", "text",
          threshold = 0.5, shingleN = 2, numHashes = 32, bands = 16)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      // brute force: exact jaccard on 2-gram shingles over all pairs
      val sh = df.select(col("doc_id"),
          graft.text.Dedup.shingles(col("text"), 2).as("sh"))
        .as[(Long, Seq[String])].collect().toMap
      val ids = sh.keys.toSeq.sorted
      val brute = (for {
        i <- ids; j <- ids if i < j
        a = sh(i).toSet; b = sh(j).toSet
        jac = if ((a ++ b).isEmpty) 0.0
              else (a intersect b).size.toDouble / (a ++ b).size
        if BigDecimal(jac).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble >= 0.5
      } yield (i, j)).toSet
      lsh == brute
    })
  }

  test("IntersectSize == size(array_intersect) on string arrays with " +
    "nulls, duplicates, and empties") {
    // batch MANY generated pairs per Spark job so the property gets
    // real coverage without a job per sample
    val elemGen = Gen.frequency(
      9 -> Gen.oneOf((0 until 8).map(i => s"e$i")),
      1 -> Gen.const(null: String))
    val arrGen = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, elemGen))
    val batchGen = Gen.listOfN(40, Gen.zip(arrGen, arrGen))
    check("intersect-size-twin")(Prop.forAll(batchGen) { pairs =>
      val df = pairs.toDF("a", "b")
      df.select(
          graft.functions.NativeExpressions
            .intersect_size(col("a"), col("b")).as("fast"),
          size(array_intersect(col("a"), col("b"))).as("ref"))
        .as[(Option[Int], Option[Int])].collect()
        .forall { case (fast, ref) => fast == ref }
    })
    // null ARRAY inputs: intersect_size is null exactly when
    // array_intersect itself is null. (size() would wrap that null to -1
    // under Spark's legacy sizeOfNull quirk — diverging from DuckDB's
    // len(list_intersect(NULL, x)) = NULL; the native form matches the
    // oracle. Shingle arrays are never null in the dedup pipelines, so
    // the jaccard() results are unaffected either way.)
    val n = spark.sql(
      "SELECT intersect_size(CAST(NULL AS array<string>), array('x')) a, " +
        "array_intersect(CAST(NULL AS array<string>), array('x')) b")
      .collect().head
    assert(n.isNullAt(0) && n.isNullAt(1))
  }

  test("SortedJaccardGe == exact-jaccard comparison on sorted long " +
    "arrays; screen never rejects a qualifying string pair") {
    // twin: the early-exit walk must agree with the exact multiset
    // jaccard Σ min(cnt) / (|a|+|b|−Σ min(cnt)) compared to θ, for
    // arrays WITH duplicates and boundary thresholds
    val arrGen = Gen.choose(0, 15)
      .flatMap(n => Gen.listOfN(n, Gen.choose(0L, 9L)))
    val batchGen = Gen.zip(
      Gen.listOfN(40, Gen.zip(arrGen, arrGen)),
      Gen.oneOf(0.2, 0.5, 0.8, 1.0))
    check("sorted-jaccard-ge-twin")(Prop.forAll(batchGen) {
      case (pairs, theta) =>
        val df = pairs.map { case (a, b) => (a.sorted, b.sorted) }
          .toDF("a", "b")
        val got = df.select(graft.functions.NativeExpressions
            .sorted_jaccard_ge(col("a"), col("b"), theta))
          .as[Boolean].collect()
        val want = pairs.map { case (a, b) =>
          val inter = (a.groupBy(identity).view.mapValues(_.size).toMap
            .keySet intersect b.toSet).toSeq
            .map(v => math.min(a.count(_ == v), b.count(_ == v))).sum
          val union = a.size + b.size - inter
          if (union == 0) true // expression over-admits 0/0
          else inter.toDouble >= theta * union
        }
        got.toSeq == want
    })
    // safety: over HASHED shingle arrays, a pair whose string-set
    // jaccard qualifies (after the pipeline's round-to-6 final filter)
    // is NEVER screened out at threshold − RoundSlack
    val strGen = Gen.choose(0, 10)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf((0 until 6).map(i => s"w$i"))))
    check("screen-superset-safe")(Prop.forAll(
      Gen.listOfN(30, Gen.zip(strGen, strGen))) { pairs =>
      val df = pairs.map { case (a, b) => (a.distinct, b.distinct) }
        .toDF("a", "b")
      val theta = 0.5
      val rows = df.select(
          graft.functions.NativeExpressions.sorted_jaccard_ge(
            graft.text.Dedup.hashedShingles(col("a")),
            graft.text.Dedup.hashedShingles(col("b")),
            theta - 1e-6).as("screen"),
          round(graft.text.Dedup.jaccard(col("a"), col("b")), 6)
            .as("j"))
        .as[(Boolean, Double)].collect()
      rows.forall { case (screen, j) => j < theta || screen }
    })
  }

  test("rollingMeans row frame == plain-Scala sliding mean on generated " +
       "events") {
    check("rolling-brute-equiv")(Prop.forAll(eventsGen) { evs =>
      val df = evs.zipWithIndex
        .map { case ((u, t), i) =>
          (i.toLong, u, new java.sql.Timestamp(t * 1000), (t % 7).toDouble) }
        .toDF("event_id", "user_id", "ts", "value")
      val got = WindowOps.rollingMeans(df, Seq("user_id"), "ts",
          Seq(col("event_id")), "value", nRows = 3, rangeSeconds = 600)
        .select("event_id", "roll_rows_avg")
        .as[(Long, Double)].collect().toMap
      val byUser = evs.zipWithIndex
        .map { case ((u, t), i) => (u, t, i.toLong, (t % 7).toDouble) }
        .groupBy(_._1)
      byUser.forall { case (_, rows) =>
        val ordered = rows.sortBy(r => (r._2, r._3))
        ordered.indices.forall { i =>
          val frame = ordered.slice(math.max(0, i - 2), i + 1).map(_._4)
          val expect = BigDecimal(frame.sum / frame.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          got(ordered(i)._3) == expect
        }
      }
    })
  }

  test("chunkOverlap: every token covered; chunks reconstruct the doc " +
       "at stride == chunk; counts match slice lengths") {
    val textGen = Gen.listOf(Gen.choose(0, 50).map(i => s"w$i"))
      .map(_.mkString(" "))
    check("chunk-coverage")(Prop.forAll(textGen, Gen.choose(1, 6)) {
      (text, stride) =>
        val chunk = stride + 2
        val df = Seq((1L, text)).toDF("doc_id", "text")
        val rows = df.select(explode(
            graft.text.TextOps.chunkOverlap(col("text"), chunk, stride))
            .as("c"))
          .select("c.chunk_idx", "c.n_chunk_tokens", "c.chunk_text")
          .as[(Int, Long, String)].collect().sortBy(_._1)
        val toks = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
        val nChunks = if (toks.isEmpty) 0
          else math.ceil(toks.size.toDouble / stride).toInt
        rows.length == nChunks &&
          rows.zipWithIndex.forall { case ((idx, n, txt), i) =>
            val expect = toks.slice(i * stride, i * stride + chunk)
            idx == i && n == expect.size && txt == expect.mkString(" ")
          }
    })
  }

  test("quantizeInt8: reconstruction error never exceeds half a step " +
       "on generated vectors") {
    val vecGen = Gen.nonEmptyListOf(
      Gen.choose(-1000, 1000).map(_ / 16.0f))
    check("quantize-bound")(Prop.forAll(vecGen) { vs =>
      val df = Seq((1L, vs)).toDF("vec_id", "embedding")
      val (maxErr, lo, hi) = df.select(
          graft.sim.Similarity.quantizeInt8(col("embedding"))("max_abs_err"),
          array_min(col("embedding")).cast("double"),
          array_max(col("embedding")).cast("double"))
        .as[(Double, Double, Double)].head()
      maxErr <= (hi - lo) / 255.0 / 2 + 1e-6
    })
  }

  test("timeWeightedAvg == plain-Scala LOCF reference on generated " +
       "events") {
    check("twa-brute-equiv")(Prop.forAll(eventsGen) { evs =>
      val df = evs.zipWithIndex
        .map { case ((u, t), i) =>
          (i.toLong, u, new java.sql.Timestamp(t * 1000),
            if (t % 5 == 0) None else Some((t % 11).toDouble)) }
        .toDF("eid", "uid", "t", "v")
      val got = WindowOps.timeWeightedAvg(df, Seq("uid"), "t",
          Seq(col("eid")), "v")
        .select("uid", "twa", "span_seconds", "n_events")
        .as[(Long, Option[Double], Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      evs.zipWithIndex
        .map { case ((u, t), i) =>
          (u, t, i.toLong, if (t % 5 == 0) None else Some((t % 11).toDouble)) }
        .groupBy(_._1)
        .forall { case (u, rows) =>
          val ordered = rows.sortBy(r => (r._2, r._3))
          val span = ordered.last._2 - ordered.head._2
          val contribs = ordered.sliding(2).collect {
            case Seq((_, t1, _, Some(v)), (_, t2, _, _)) =>
              BigDecimal(v) * (t2 - t1)
          }.toList
          val num = contribs.sum
          // replicate the operator's arithmetic exactly: exact decimal
          // numerator, ONE double division, Spark's Round (HALF_UP on
          // the double's shortest decimal repr) — an exact-decimal
          // division here could disagree at a round-6 midpoint (the
          // e_label_centroid lesson)
          // no weighted observation at all (every non-final value null)
          // -> null, matching SUM-over-nothing in both engines
          val expect =
            if (span <= 0 || contribs.isEmpty) None
            else Some(BigDecimal(java.math.BigDecimal.valueOf(
              num.toDouble / span))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          got(u) == ((expect, span, rows.size.toLong))
        }
    })
  }

  test("asOfJoinTolerance == brute-force latest-within-tolerance on " +
       "generated data") {
    val gen = for {
      left <- Gen.nonEmptyListOf(for {
        k <- Gen.choose(1L, 3L); t <- Gen.choose(0L, 1000L)
      } yield (k, t))
      right <- Gen.listOf(for {
        k <- Gen.choose(1L, 3L); t <- Gen.choose(0L, 1000L)
      } yield (k, t))
    } yield (left, right.distinct) // unique (k, rt) per contract
    check("asof-tolerance-brute")(Prop.forAll(gen, Gen.choose(0L, 500L)) {
      case ((left, right), tol) =>
        val l = left.zipWithIndex.map { case ((k, t), i) =>
          (i.toLong, k, new java.sql.Timestamp(t * 1000)) }
          .toDF("eid", "k", "t")
        val r = right.map { case (k, t) =>
          (k, new java.sql.Timestamp(t * 1000), s"p$k-$t") }
          .toDF("k", "rt", "payload")
        val got = Joins.asOfJoinTolerance(l, r, Seq("k"), "t", "rt",
            Seq("payload"), toleranceSeconds = tol)
          .select("eid", "payload").as[(Long, Option[String])]
          .collect().toMap
        left.zipWithIndex.forall { case ((k, t), i) =>
          val expect = right.filter(rr => rr._1 == k && rr._2 <= t)
            .sortBy(_._2).lastOption
            .filter(rr => t - rr._2 <= tol)
            .map(rr => s"p$k-${rr._2}")
          got(i.toLong) == expect
        }
    })
  }

  test("sessionize: session ids start at 1, increase by at most 1 per event") {
    check("session-monotone")(Prop.forAll(eventsGen) { evs =>
      val df = evs.zipWithIndex
        .map { case ((u, t), i) => (i.toLong, u,
          new java.sql.Timestamp(t * 1000)) }
        .toDF("event_id", "user_id", "ts")
      val out = WindowOps.sessionize(df, Seq("user_id"), "ts",
          gapSeconds = 600, tiebreak = Seq(col("event_id")))
        .select("user_id", "ts", "event_id", "session_id")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
          r.getLong(3)))
      out.groupBy(_._1).forall { case (_, rows) =>
        val ids = rows.sortBy(r => (r._2, r._3)).map(_._4)
        ids.head == 1L && ids.sliding(2).forall {
          case Array(a, b) => b == a || b == a + 1
          case _ => true
        }
      }
    })
  }

  test("NfcNormalize == JDK Normalizer on combining sequences; " +
    "idempotent; ASCII passthrough; SQL surface") {
    import graft.functions.NativeExpressions
    val cases = Seq(
      "cafe\u0301",                 // e + combining acute -> precomposed
      "A\u030A",                    // A + combining ring above
      "c\u0327\u0301at",            // cedilla then acute (multi-mark)
      "\u1100\u1161",               // Hangul jamo pair -> one syllable
      "plain ascii stays",
      "already \u00e9 composed",
      "")
    val df = cases.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
      .select(col("id"), col("s"),
        NativeExpressions.nfc_normalize(col("s")).as("n"))
    val got = df.orderBy("id").select("s", "n")
      .as[(String, String)].collect()
    got.foreach { case (s, n) =>
      val expect = java.text.Normalizer.normalize(s,
        java.text.Normalizer.Form.NFC)
      assert(n == expect, s"NFC mismatch for ${s.codePoints().toArray.toSeq}")
    }
    // idempotent: normalizing the normalized column is a fixpoint
    val twice = df.select(
      NativeExpressions.nfc_normalize(col("n")).as("n2"), col("n"))
      .filter(col("n2") =!= col("n")).count()
    assert(twice == 0L)
    // null in, null out
    val nr = Seq((1L, null: String)).toDF("id", "s")
      .select(NativeExpressions.nfc_normalize(col("s"))).collect()(0)
    assert(nr.isNullAt(0))
    // SQL surface
    NativeExpressions.registerAll(spark)
    val viaSql = spark.sql(
      "SELECT nfc_normalize('cafe\u0301')").as[String].collect()(0)
    assert(viaSql == "caf\u00e9")
  }

  test("Prefix.strictBelow == a brute per-group scan on random " +
    "frames (negative keys, duplicate-free), any bucket size") {
    val frameGen: Gen[(List[(Int, Long, Long)], Long)] = for {
      n <- Gen.choose(1, 20)
      rows <- Gen.listOfN(n, for {
        g <- Gen.choose(0, 2)
        k <- Gen.choose(-50L, 50L)
        m <- Gen.choose(-5L, 20L)
      } yield (g, k, m))
      b <- Gen.oneOf(2L, 7L, 1048576L)
    } yield (rows.groupBy(r => (r._1, r._2)).map(_._2.head).toList, b)
    check("prefix-vs-brute")(Prop.forAll(frameGen) { case (rows, b) =>
      val df = rows.toDF("g", "k", "m")
      val got = Prefix.strictBelow(df, Seq("g"), "k", Seq("m"), b)
        .select("g", "k", "__below_m")
        .as[(Int, Long, Long)].collect().toSet
      val want = rows.map { case (g, k, _) =>
        (g, k, rows.filter(r => r._1 == g && r._2 < k).map(_._3).sum)
      }.toSet
      got == want
    })
  }

  test("spearmanCorr stays in [-1, 1] and is symmetric in its " +
    "arguments on random pairs") {
    val pairsGen: Gen[List[(Double, Double)]] = for {
      n <- Gen.choose(2, 15)
      rows <- Gen.listOfN(n, for {
        x <- Gen.choose(-100, 100)
        y <- Gen.choose(-100, 100)
      } yield (x.toDouble, y.toDouble))
    } yield rows
    check("spearman-bounds-symmetry")(Prop.forAll(pairsGen) { rows =>
      val df = rows.toDF("x", "y")
      val rxy = Quality.spearmanCorr(df, "x", "y")
        .as[(Long, Option[Double])].collect().head._2
      val ryx = Quality.spearmanCorr(df, "y", "x")
        .as[(Long, Option[Double])].collect().head._2
      rxy == ryx && rxy.forall(v => v >= -1.0 && v <= 1.0)
    })
  }

  test("cohenKappa <= 1 always, and equals 1 iff agreement is total " +
    "(on random paired labels)") {
    val gen: Gen[List[(String, String)]] = for {
      n <- Gen.choose(1, 20)
      rows <- Gen.listOfN(n, for {
        a <- Gen.oneOf("x", "y", "z")
        b <- Gen.oneOf("x", "y", "z")
      } yield (a, b))
    } yield rows
    check("kappa-bounds")(Prop.forAll(gen) { rows =>
      val got = Quality.cohenKappa(rows.toDF("a", "b"), "a", "b")
        .as[(Long, Long, Option[Double])].collect().head
      val total = got._1 == got._2
      got._3.forall(_ <= 1.0 + 1e-9) &&
        (got._3.isEmpty || !total || got._3.contains(1.0))
    })
  }

  test("giniConcentration lands in [0, 1) and is 0 exactly for " +
    "equal positive unit totals") {
    val gen: Gen[List[(Int, Double)]] = for {
      n <- Gen.choose(1, 15)
      rows <- Gen.listOfN(n, for {
        u <- Gen.choose(0, 9)
        w <- Gen.choose(0, 50)
      } yield (u, w.toDouble))
    } yield rows
    check("gini-bounds")(Prop.forAll(gen) { rows =>
      val got = Analytics.giniConcentration(rows.toDF("u", "w"),
          Seq("u"), "w")
        .as[(Long, Long, Long, Option[Double])].collect().head
      got._4.forall(g => g >= 0.0 && g < 1.0)
    })
  }

  test("averagePrecision lands in (0, 1] whenever positives exist, " +
    "and 1.0 when every positive outranks every negative") {
    val gen: Gen[List[(Double, Boolean)]] = for {
      n <- Gen.choose(1, 15)
      rows <- Gen.listOfN(n, for {
        s <- Gen.choose(0, 20)
        p <- Gen.oneOf(true, false)
      } yield (s / 20.0, p))
    } yield rows
    check("ap-bounds")(Prop.forAll(gen) { rows =>
      val df = rows.toDF("s", "p")
      val got = Quality.averagePrecision(df, "s", col("p"))
        .as[(Long, Long, Option[Double])].collect().head
      if (got._1 == 0) got._3.isEmpty
      else {
        val minPos = rows.filter(_._2).map(_._1).min
        val maxNeg = (rows.filterNot(_._2).map(_._1) :+ -1.0).max
        got._3.exists(v => v > 0.0 && v <= 1.0 + 1e-9) &&
          (maxNeg >= minPos || got._3.contains(1.0))
      }
    })
  }

  test("round6Micro == the round→decimal(18,6)→×10⁶ reference on " +
    "boundary-adversarial doubles (exact halves, near-halves, " +
    "overflow, NaN/Inf)") {
    import graft.functions.NativeExpressions.round6Micro
    def reference(x: Double): Option[Long] = {
      // Spark's Round double branch then the non-ANSI decimal cast
      if (x.isNaN || x.isInfinite) return None
      val bd = java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP)
      if (bd.precision > 18) None
      else Some(bd.unscaledValue.longValue)
    }
    val pinned = Seq(0.0, -0.0, 1.2345675, -1.2345675, 1.2345665,
      0.0000005, -0.0000005, 0.9999995, 123456.1234565,
      999999999999.999999, 1e12, -1e12, 1e13, 4.5e15, 9e18,
      Double.MinPositiveValue, 0.1, 1.0 / 3.0, 2.675, -2.675,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
    pinned.foreach { x =>
      assert(Option(round6Micro(x)).map(_.longValue) == reference(x),
        s"round6Micro($x)")
    }
    val rnd = new scala.util.Random(7)
    (1 to 200000).foreach { _ =>
      // mix magnitudes; bias toward values whose 1e6-scaled fraction
      // sits near .5 (the fast-path guard's hard region)
      val base = rnd.nextInt(4) match {
        case 0 => rnd.nextDouble() * 2 - 1
        case 1 => (rnd.nextDouble() * 2 - 1) * 1e6
        case 2 => (rnd.nextInt(2000001) - 1000000 + 0.5) / 1e6
        case _ => (rnd.nextDouble() * 2 - 1) * 1e13
      }
      assert(Option(round6Micro(base)).map(_.longValue) ==
        reference(base), s"round6Micro($base)")
    }
  }

  test("canonicalizeUrl == an independent Scala reference on randomly " +
    "assembled URLs (scheme/www/port/path/params/fragment variants)") {
    import graft.text.TextOps
    def refCanon(u0: String): String = {
      val t = u0.trim
      val schemeRe =
        "^([A-Za-z][A-Za-z0-9+.-]*)://(?:[wW]{3}\\.)?([^/?#]*)".r
      val low = schemeRe.findFirstMatchIn(t) match {
        case Some(m) => m.group(1).toLowerCase + "://" +
          m.group(2).toLowerCase + t.substring(m.end)
        case None => t
      }
      val noPort = low
        .replaceAll("^(https://[^/?#:]*):443([/?#].*)?$", "$1$2")
        .replaceAll("^(http://[^/?#:]*):80([/?#].*)?$", "$1$2")
      val noFrag = noPort.replaceAll("#.*$", "")
      val q = noFrag.indexOf('?')
      val base = (if (q >= 0) noFrag.substring(0, q) else noFrag)
        .replaceAll("/$", "")
      if (q < 0) base
      else {
        val ps = noFrag.substring(q + 1).split("&", -1).toSeq
          .filter(p => p.nonEmpty &&
            !p.matches("^(utm_[^=]*|gclid|fbclid)(=|$).*"))
          .sorted
        if (ps.isEmpty) base else base + "?" + ps.mkString("&")
      }
    }
    val gen: Gen[String] = for {
      scheme <- Gen.oneOf("https", "HTTPS", "http", "ftp", "")
      www <- Gen.oneOf("", "www.", "WWW.", "wWw.")
      host <- Gen.oneOf("Ex.com", "ex.com", "a-b.ORG", "wwwx.net")
      port <- Gen.oneOf("", ":443", ":80", ":8443")
      path <- Gen.oneOf("", "/", "/A/b", "/A/b/", "/x")
      params <- Gen.someOf(Seq("a=1", "b=2", "utm_source=x",
        "gclid=9", "xutm_a=1", "fbclid", "utm_campaign=y"))
      shuffledQ <- Gen.oneOf(true, false)
      frag <- Gen.oneOf("", "#f", "#sec-2")
      pad <- Gen.oneOf("", "  ")
    } yield {
      val ps = if (shuffledQ) params.reverse else params
      val qs = if (ps.isEmpty) "" else "?" + ps.mkString("&")
      val auth = if (scheme.isEmpty) "" else s"$scheme://"
      s"$pad$auth$www$host$port$path$qs$frag$pad"
    }
    check("url-canon")(Prop.forAll(gen) { u =>
      val got = Seq(u).toDF("u")
        .select(graft.text.TextOps.canonicalizeUrl(col("u")).as("c"))
        .as[String].collect().head
      got == refCanon(u)
    })
  }

  test("ChrfGramStats == a brute substring-count reference on random " +
    "strings (spaces stripped, supplementary codepoints, empty sides)") {
    import graft.functions.NativeExpressions
    // alphabet mixes ASCII, a space (stripped), a combining-free
    // 2-byte char, and a SUPPLEMENTARY codepoint (2 UTF-16 units) so
    // the codepoint-not-char contract is exercised
    val alpha = Seq("a", "b", " ", "é", "😀")
    val gen: Gen[(String, String)] = for {
      lc <- Gen.choose(0, 24); lr <- Gen.choose(0, 24)
      c <- Gen.listOfN(lc, Gen.oneOf(alpha))
      r <- Gen.listOfN(lr, Gen.oneOf(alpha))
    } yield (c.mkString, r.mkString)
    def brute(cand: String, ref: String, maxN: Int)
        : Seq[(Long, Long, Long)] = {
      def cps(s: String): Vector[Int] =
        s.codePoints().toArray.toVector.filter(_ != 0x20)
      val c = cps(cand); val r = cps(ref)
      (1 to maxN).map { n =>
        val cg = c.sliding(n).filter(_.size == n).toSeq
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        val rg = r.sliding(n).filter(_.size == n).toSeq
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        val m = cg.map { case (g, cc) =>
          math.min(cc, rg.getOrElse(g, 0L)) }.sum
        (m, math.max(0, c.size - n + 1).toLong,
          math.max(0, r.size - n + 1).toLong)
      }
    }
    check("chrf-gram-stats")(Prop.forAll(gen) { case (cand, ref) =>
      val df = Seq((cand, ref)).toDF("c", "r")
      val got = df.select(
          NativeExpressions.chrf_gram_stats(col("c"), col("r"), 6)
            .as("st"))
        .selectExpr("inline(st)")
        .as[(Long, Long, Long)].collect().toSeq
      got == brute(cand, ref, 6)
    })
  }

  test("PcaTriangleMicros == its Column twin (transform/slice round→" +
    "decimal chain) on random float vectors with nulls") {
    import graft.sim.Similarity
    import graft.functions.NativeExpressions
    val gen: Gen[List[List[Option[Float]]]] = for {
      d <- Gen.choose(1, 7)
      n <- Gen.choose(1, 8)
      rows <- Gen.listOfN(n, Gen.listOfN(d, for {
        kind <- Gen.choose(0, 9)
        m <- Gen.choose(-2000000, 2000000)
      } yield if (kind == 0) None
        // kind 1–2: small magnitudes (products well inside
        // decimal(18,6)); kind 3: ~1e6–1e7 so pairwise products
        // exceed the 1e12 overflow bound and the native null-on-
        // overflow branch (boxed GenericArrayData with MIXED null
        // and non-null products in one row) is exercised against
        // the Column twin's cast-null behavior
        else Some(if (kind == 1) m / 2e6f
          else if (kind == 3) m * 5.000001f
          else m / 1000f)))
    } yield rows
    check("pca-moments-parity")(Prop.forAll(gen) { rows =>
      val d = rows.head.length
      val df = rows.zipWithIndex
        .map { case (v, i) => (i.toLong, v.map(_.map(Float.box).orNull)) }
        .toDF("id", "v")
      val both = df.select(
          NativeExpressions.pca_triangle_micros(col("v")).as("a"),
          Similarity.pcaTriangleMicrosCols(col("v"), d).as("b"))
        .collect()
      both.forall { r =>
        r.getSeq[Any](0) == r.getSeq[Any](1)
      }
    })
  }
}
