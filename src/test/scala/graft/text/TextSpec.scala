package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("tokens: whitespace split, no empty tokens") {
    val out = Seq("  a  b\tc ", "", "solo").toDF("t")
      .select(TextOps.tokenCount(col("t")).as("n")).as[Long].collect()
    assert(out.toSeq == Seq(3L, 0L, 1L))
  }

  test("normalize: lowercase, strip punct, collapse whitespace") {
    val out = Seq("Hello,  WORLD!! 42").toDF("t")
      .select(TextOps.normalize(col("t")).as("n")).as[String].collect()
    assert(out.head == "hello world 42")
  }

  test("stopword and alpha ratios") {
    val df = Seq("the cat sat on the mat").toDF("t")
    val sw = df.select(TextOps.stopwordCount(col("t")).as("n")).as[Long].head()
    assert(sw == 3) // the, on, the
    val ar = df.select(TextOps.alphaRatio(col("t")).as("r")).as[Double].head()
    assert(math.abs(ar - 17.0 / 22.0) < 1e-9)
  }

  test("langId picks language with most marker hits; und when none") {
    val out = Seq(
      "the state of the art is in the details",
      "el perro y la casa de los abuelos",
      "zzz qqq xxx").toDF("t")
      .select(TextOps.langId(col("t")).as("l")).as[String].collect()
    assert(out.toSeq == Seq("en", "es", "und"))
  }

  test("fingerprint: deterministic, order-sensitive") {
    val fp = Seq("a b c", "a b c", "c b a").toDF("t")
      .select(TextOps.fingerprint(col("t")).as("f")).as[Long].collect()
    assert(fp(0) == fp(1) && fp(0) != fp(2))
  }

  test("shingles: 3-grams of tokens; short doc yields single partial shingle") {
    val out = Seq("a b c d", "a b").toDF("t")
      .select(Dedup.shingles(col("t"), 3).as("sh"))
      .as[Seq[String]].collect()
    assert(out(0).toSet == Set("a b c", "b c d"))
    assert(out(1).toSet == Set("a b"))
  }

  test("jaccard: exact set similarity") {
    val df = Seq(("a b c d", "a b c e")).toDF("t1", "t2")
      .select(Dedup.jaccard(Dedup.shingles(col("t1"), 1),
        Dedup.shingles(col("t2"), 1)).as("j"))
    assert(math.abs(df.as[Double].head() - 3.0 / 5.0) < 1e-9)
  }

  test("minhash signature: equal texts equal sigs; est jaccard tracks exact") {
    val df = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),       // identical
      (3L, "w1 w2 w3 w4 w5 q6 q7 q8 q9 q10"),       // half overlap
      (4L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")        // disjoint
    ).toDF("id", "t")
    val pairs = Dedup.nearDuplicates(df, "id", "t", threshold = 0.9,
      shingleN = 1, numHashes = 32, bands = 16)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("packChunks: docs map to the chunk where they start, per shard") {
    val df = Seq(
      (1L, 600L, 0L), (2L, 500L, 0L), (3L, 400L, 0L), (4L, 700L, 0L),
      (5L, 100L, 1L)
    ).toDF("doc_id", "n_tokens", "shard")
    val out = TextOps.packChunks(df, "doc_id", "n_tokens", "shard", 1000L)
      .select("doc_id", "chunk_in_shard").as[(Long, Long)].collect().toMap
    // shard 0 cumulative starts: 0, 600, 1100, 1500 -> chunks 0,0,1,1
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 0L))
  }

  test("crossCorpusNearDuplicates: only cross-side pairs, verified exact") {
    val train = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six")).toDF("doc_id", "text")
    val eval_ = Seq(
      (1L, "alpha beta gamma delta epsilon eta"),   // near-dup of 0
      (3L, "totally different content here now"),
      (5L, "one two three four five six")           // exact dup of 2
    ).toDF("doc_id", "text")
    val out = Dedup.crossCorpusNearDuplicates(train, eval_, "doc_id", "text",
        threshold = 0.4, shingleN = 1)
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    assert(out == Set((0L, 1L), (2L, 5L)))
  }

  test("decontaminateBloom == crossCorpusNearDuplicates; the bloom prune " +
    "keeps every overlapping train doc and drops the disjoint bulk") {
    // eval: a handful of docs; train: planted near-dups of eval + a
    // large disjoint-vocabulary bulk that the prune must cut
    val eval_ = (0 until 5).map { i =>
      (1000L + i, (0 until 12).map(k => s"ev${i}_$k").mkString(" "))
    }.toDF("doc_id", "text")
    val overlapping = (0 until 5).map { i =>
      // 10 of 12 words shared with eval doc i → jaccard well over 0.4
      (i.toLong,
        ((0 until 10).map(k => s"ev${i}_$k") :+ s"tr${i}a" :+ s"tr${i}b")
          .mkString(" "))
    }
    val bulk = (100 until 400).map { i =>
      (i.toLong, (0 until 12).map(k => s"bulk${i}_$k").mkString(" "))
    }
    val train = (overlapping ++ bulk).toDF("doc_id", "text")
    val exact = Dedup.crossCorpusNearDuplicates(train, eval_, "doc_id",
        "text", threshold = 0.4, shingleN = 1)
      .as[(Long, Long, Double)].collect().toSet
    assert(exact.map(_._1) == (0 until 5).map(_.toLong).toSet)
    val bloomed = Dedup.decontaminateBloom(train, eval_, "doc_id", "text",
        threshold = 0.4, shingleN = 1)
      .as[(Long, Long, Double)].collect().toSet
    assert(bloomed == exact)
    // the prune itself: completeness (all 5 overlapping docs survive)
    // and effectiveness (the hit-count bound kills the disjoint bulk —
    // a single-hit predicate would leak ~m·fpp of it through)
    val survivors = Dedup.bloomPrune(train, eval_, "text", 0.4, 1,
        expectedShingles = 1L << 16, fpp = 0.03)
      .select("doc_id").as[Long].collect().toSet
    assert((0 until 5).forall(i => survivors.contains(i.toLong)))
    assert(survivors.count(_ >= 100L) <= 10,
      s"prune leaked ${survivors.count(_ >= 100L)} of 300 disjoint docs")
  }

  test("containedNgrams: verbatim quote detected, near-miss and clean " +
    "docs are not; counts are distinct shared grams") {
    val evalDoc = (0 until 20).map(k => s"ev$k").mkString(" ")
    val eval_ = Seq((100L, evalDoc)).toDF("doc_id", "text")
    val train = Seq(
      // doc 0: quotes eval tokens 5..9 (5-token run → one 5-gram at n=5)
      //        inside unrelated text
      (0L, ("x1 x2 x3 " + (5 until 10).map(k => s"ev$k").mkString(" ") +
        " x4 x5 x6")),
      // doc 1: quotes tokens 0..6 (7-token run → three 5-grams)
      (1L, (0 until 7).map(k => s"ev$k").mkString(" ") + " y1 y2"),
      // doc 2: shares tokens but never 5 consecutive
      (2L, "ev0 z1 ev1 z2 ev2 z3 ev3 z4 ev4"),
      // doc 3: disjoint
      (3L, "q1 q2 q3 q4 q5 q6 q7 q8")
    ).toDF("doc_id", "text")
    val got = Dedup.containedNgrams(train, eval_, "doc_id", "text", n = 5)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 1L, 1L -> 3L), got.toString)
  }

  test("duplicateClusters: transitive chain merges, min id is canonical") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id1", "id2")
    val out = Dedup.duplicateClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("duplicateClusters: 200-long chain converges via pointer jumping " +
    "(one-hop propagation would need 200 rounds)") {
    val pairs = (0L until 199L).map(i => (i, i + 1)).toDF("id1", "id2")
    val out = Dedup.duplicateClusters(pairs, maxIters = 12)
      .as[(Long, Long)].collect()
    assert(out.length == 200 && out.forall(_._2 == 0L))
  }

  test("exactByContent: groups identical (optionally normalized) texts") {
    val df = Seq(
      (1L, "Hello World"), (2L, "Hello World"), (3L, "hello,  world")
    ).toDF("doc_id", "text")
    val exact = Dedup.exactByContent(df, "doc_id", "text")
    assert(exact.count() == 2)
    assert(exact.filter(col("n_copies") === 2).select("keep_id")
      .as[Long].head() == 1L)
    val norm = Dedup.exactByContent(df, "doc_id", "text", normalized = true)
    assert(norm.count() == 1 && norm.select("n_copies").as[Long].head() == 3L)
  }

  test("simhash: identical texts distance 0; near texts closer than far") {
    val df = Seq(
      ("a", "the quick brown fox jumps over the lazy dog every day"),
      ("b", "the quick brown fox jumps over the lazy dog every night"),
      ("c", "completely different words appear in this unrelated sentence here")
    ).toDF("id", "t").select(col("id"), Dedup.simhash(col("t")).as("h"))
    val m = df.as[(String, Long)].collect().toMap
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(m("a"), m("a")) == 0)
    assert(ham(m("a"), m("b")) < ham(m("a"), m("c")))
  }

  // ---- native-vs-Column equivalence: the Column twins are the
  // executable specs; these tests pin the natives to them ----

  private val gnarly = Seq(
    "Hello,  WORLD!! 42", "", "   ", "a", "ALL CAPS AND-DASHES",
    "tabs\tand\nnewlines  mixed", "unicode: café naïve 中文!",
    "trailing junk...", "...leading junk", "a1b2c3", "x  y   z",
    "the quick brown fox jumps over the lazy dog")

  test("normalize native == regex twin on gnarly inputs") {
    val df = gnarly.toDF("t")
    val diff = df.filter(
      TextOps.normalize(col("t")) =!= TextOps.normalizeCols(col("t")))
    assert(diff.count() == 0)
    // and pin one value outright
    val v = Seq("  Mixed __ CASE,, 7x ").toDF("t")
      .select(TextOps.normalize(col("t"))).as[String].head()
    assert(v == "mixed case 7x")
  }

  test("minhash signature native == Column twin, element for element") {
    val df = gnarly.filter(_.trim.nonEmpty).toDF("t")
      .select(Dedup.shingles(col("t"), 2).as("sh"))
    val diff = df.filter(
      Dedup.minhashSignature(col("sh"), 32) =!=
        Dedup.minhashSignatureCols(col("sh"), 32))
    assert(diff.count() == 0)
  }

  test("word shingles native == Column twin (order, partials, empties)") {
    for (n <- Seq(1, 2, 3, 5)) {
      val df = gnarly.toDF("t")
      val diff = df.filter(
        Dedup.shingles(col("t"), n) =!= Dedup.shinglesCols(col("t"), n))
      assert(diff.count() == 0, s"n=$n")
    }
  }

  test("portable simhash native == Column twin") {
    // ASCII-only: the Column twin's ascii() is byte-oriented on
    // multi-byte chars while the native (and DuckDB) use code points;
    // the corpus contract is ASCII text (TESTDATA.md).
    val df = gnarly.filter(_.forall(_ < 128)).toDF("t")
    val diff = df.filter(
      Dedup.simhash(col("t")) =!= Dedup.portableSimhashCols(col("t")))
    assert(diff.count() == 0)
    // top two bits always clear (62-bit hash)
    val bad = df.filter(
      Dedup.simhash(col("t")).bitwiseAND(lit(3L << 62)) =!= 0L)
    assert(bad.count() == 0)
  }

  test("curationKeep == separate qualityScore + langId predicates") {
    val df = (gnarly ++ Seq(
      "the quick brown fox and the lazy dog are in the yard with a ball " +
        "and this text is long enough to score well on length for sure " +
        "because it keeps going and going with many common words in it",
      "el la de que y en los " * 10)).toDF("t")
    val diff = df.filter(
      TextOps.curationKeep(col("t"), 0.5, "en") =!=
        (TextOps.qualityScore(col("t")) >= 0.5 &&
          TextOps.langId(col("t")) === "en"))
    assert(diff.count() == 0)
    // fixture sanity: at least one row on each side of the predicate
    val keeps = df.filter(TextOps.curationKeep(col("t"), 0.5, "en")).count()
    assert(keeps > 0 && keeps < df.count())
  }

  test("native functions registered on the SQL surface") {
    val r = spark.sql(
      "SELECT normalize_spaces(lower('A,,B')) AS n, " +
        "portable_simhash(array('x','y')) AS h, " +
        "intersect_size(array('a','b','c'), array('b','c','d')) AS i")
      .collect().head
    assert(r.getString(0) == "a b")
    assert(r.getLong(1) != 0L)
    assert(r.getInt(2) == 2)
  }

  test("simhashCandidates finds near pair, skips far pair") {
    val base = "the quick brown fox jumps over the lazy dog while birds " +
      "sing in the morning light and rivers flow gently through green valleys"
    val df = Seq(
      (1L, base + " today"),
      (2L, base + " tonight"),
      (3L, "totally unrelated content about spark query engines shuffles " +
        "partitions caching broadcast joins codegen adaptive execution plans")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashCandidates(df, "doc_id", "text", maxHamming = 12)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("simhash block permutations: full recall vs brute force; " +
    "key wider than single-chunk banding") {
    // 60 docs drawn from templates with word swaps — a mix of hamming
    // distances straddling the radius
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val docs = (0 until 60).map { i =>
      val base = (0 until 12).map(k => words((i / 20 + k) % words.size))
      val txt = base.updated(i % 12, words(i % words.size)).mkString(" ")
      (i.toLong, txt)
    }
    val df = docs.toDF("doc_id", "text")
    for (mh <- Seq(2, 3, 4)) {
      val got = Dedup.simhashCandidates(df, "doc_id", "text", maxHamming = mh)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      val sh = df.select(col("doc_id"), Dedup.simhash(col("text")).as("h"))
        .as[(Long, Long)].collect()
      val brute = (for {
        (i1, h1) <- sh; (i2, h2) <- sh
        if i1 < i2 && java.lang.Long.bitCount(h1 ^ h2) <= mh
      } yield (i1, i2)).toSet
      assert(got == brute, s"maxHamming=$mh: ${got.size} vs ${brute.size}")
    }
  }

  test("simhash maxBucket drops dense buckets with an observable count") {
    // adversarial density: every doc is boilerplate + one unique token,
    // so all simhashes are (near-)identical — one giant bucket per band.
    // The cap keeps the bucket out of the agg buffer and the quadratic
    // pair expansion; the Observation makes the recall loss measurable.
    val boiler = Seq.fill(40)("the").mkString(" ")
    // plus a sparse tail that survives the cap — with EVERY bucket
    // dropped, AQE empty-relation propagation elides the metrics node
    // (documented caveat in the scaladoc)
    val df = ((0 until 3000).map(i => (i.toLong, s"$boiler unique$i")) ++
      (0 until 40).map(i => (3000L + i, s"ordinary document number $i " +
        s"with varied content about topic$i and subject$i")))
      .toDF("doc_id", "text")
    val obs = new org.apache.spark.sql.Observation("simhash_cap")
    val out = Dedup.simhashCandidates(df, "doc_id", "text", maxHamming = 3,
      maxBucket = 100, obs = Some(obs))
    val nPairs = out.count()
    val dropped = obs.get("dropped_rows").asInstanceOf[Long]
    val maxB = obs.get("max_bucket").asInstanceOf[Long]
    assert(maxB > 100, s"fixture sanity: expected a dense bucket, max=$maxB")
    assert(dropped > 0L)
    // bounded expansion: nothing near the 3000²/2 uncapped pair blowup
    assert(nPairs <= 100L * 100L)
  }

  test("bigrams: adjacent lowercased token pairs; short docs empty") {
    val df = Seq((1L, "The quick  brown fox"), (2L, "solo"), (3L, ""))
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextOps.bigrams(col("text")).as("b"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) == Seq("the quick", "quick brown", "brown fox"))
    assert(got(2L).isEmpty && got(3L).isEmpty)
  }

  test("scrubPii redacts emails and phone-like runs, leaves prose alone") {
    val df = Seq(
      (1L, "mail a.b+c@ex-ample.org now"),
      (2L, "call +1 555 0100 99 today"),
      (3L, "no pii here at all")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextOps.scrubPii(col("text")).as("c"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "mail <EMAIL> now")
    assert(got(2L) == "call <PHONE> today")
    assert(got(3L) == "no pii here at all")
  }

  test("stratifiedKeep: deterministic, respects per-stratum rates") {
    val df = (0 until 1000).map(i =>
      (i.toLong, if (i % 2 == 0) "en" else "other")).toDF("id", "lang")
    val kept = df.filter(TextOps.stratifiedKeep(col("id"), col("lang"),
        Map("en" -> 10), defaultPct = 50))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // 500 per stratum; hash is uniform-ish — wide tolerance, zero flake
    // (the predicate is fully deterministic; bounds just sanity-check it)
    assert(kept("en") > 20 && kept("en") < 90, kept.toString)
    assert(kept("other") > 175 && kept("other") < 325, kept.toString)
    // repeat run must be identical (no RNG state)
    val again = df.filter(TextOps.stratifiedKeep(col("id"), col("lang"),
        Map("en" -> 10), defaultPct = 50))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(again == kept)
  }

  test("mixCorpus == single-window greedy prefix; shard-count invariant; " +
    "budgets never exceeded; excluded domains dropped") {
    // uneven domains, varied doc lengths, ids sparse enough that the
    // portable hash scrambles the natural order
    val docs = (0 until 300).map { i =>
      val dom = Seq("en", "es", "fr", "zh")(i % 4)
      val words = (0 until (3 + (i * 13) % 40)).map(k => s"w$k")
      (i.toLong * 17 + 5, dom, words.mkString(" "))
    }
    val df = docs.toDF("doc_id", "lang", "text")
    val weights = Map("en" -> 0.5, "es" -> 0.3, "fr" -> 0.2)
    val budgetTotal = 1200L
    val got = TextOps.mixCorpus(df, "doc_id", "text", "lang", weights,
        budgetTotal)
      .as[(Long, String, Long, Long)].collect().toSet
    // brute force: greedy prefix per domain in (portableHash, id) order
    def pHash(id: Long): Long = ((id % 2147483647L) * 2654435761L) %
      2147483647L
    val brute = docs
      .map { case (id, dom, text) =>
        (id, dom, text.split("\\s+").count(_.nonEmpty).toLong) }
      .filter { case (_, dom, _) => weights.contains(dom) }
      .groupBy(_._2).flatMap { case (dom, rows) =>
        val budget = math.floor(weights(dom) * budgetTotal).toLong
        var cum = 0L
        rows.sortBy { case (id, _, _) => (pHash(id), id) }.flatMap {
          case (id, d, n) =>
            cum += n
            if (cum <= budget) Some((id, d, n, cum)) else None
        }
      }.toSet
    assert(got == brute,
      s"got=${got.size} brute=${brute.size} " +
        s"missing=${(brute -- got).take(3)} extra=${(got -- brute).take(3)}")
    // hierarchical sharded running sum == flat: any shard count agrees
    for (sh <- Seq(1, 5, 64)) {
      val alt = TextOps.mixCorpus(df, "doc_id", "lang", "lang", weights,
        budgetTotal, shards = sh) // domain as text → token count 1/doc
      val altText = TextOps.mixCorpus(df, "doc_id", "text", "lang", weights,
          budgetTotal, shards = sh)
        .as[(Long, String, Long, Long)].collect().toSet
      assert(altText == brute, s"shards=$sh diverges from flat greedy")
      assert(alt.columns.toSeq ==
        Seq("doc_id", "lang", "n_tokens", "cum_tokens"))
    }
    // per-domain kept tokens within budget; zh never appears
    val byDom = got.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(!byDom.contains("zh"))
    byDom.foreach { case (d, tot) =>
      assert(tot <= math.floor(weights(d) * budgetTotal).toLong, s"$d=$tot")
    }
  }

  test("simhash banding: bucket-size window and groupBy share one exchange") {
    val df = (0 until 50).map(i => (i.toLong, s"doc number $i content"))
      .toDF("doc_id", "text")
    val out = Dedup.simhashCandidates(df, "doc_id", "text", maxHamming = 3)
    val plan = out.queryExecution.executedPlan.toString
    // the (band, key) partitioning is exchanged ONCE: the window count
    // and the collect_list agg both consume it
    val exchanges = "Exchange hashpartitioning\\(band".r.findAllIn(plan).size
    assert(exchanges == 1, plan.take(1500))
  }

  test("jaccardSimilarityJoin: EXACT — equals brute force at several " +
    "thresholds, including boundary-ratio pairs") {
    // templated corpus with word swaps → a spread of jaccard values,
    // plus subset pairs whose jaccard hits the threshold EXACTLY
    // (j = 2/5 at θ=0.4) to probe the float boundary slack
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val docs = (0 until 50).map { i =>
      val base = (0 until 10).map(k => words((i / 10 + k) % words.size))
      (i.toLong, base.updated(i % 10, words(i % words.size)).mkString(" "))
    } ++ Seq(
      (100L, "p q r s t u v"),   // shingle(1-gram-ish via n=3) overlap…
      (101L, "p q r s t u v w x y z aa bb cc"))
    val df = docs.toDF("doc_id", "text")
    for (th <- Seq(0.3, 0.4, 0.5, 0.8)) {
      val got = Dedup.jaccardSimilarityJoin(df, "doc_id", "text", th)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      val sh = df.select(col("doc_id"),
          Dedup.shingles(col("text"), 3).as("sh"))
        .as[(Long, Seq[String])].collect()
      val brute = (for {
        (i1, s1) <- sh; (i2, s2) <- sh
        if i1 < i2
        inter = s1.toSet.intersect(s2.toSet).size
        un = s1.toSet.union(s2.toSet).size
        if un > 0 && inter.toDouble / un >= th
      } yield (i1, i2)).toSet
      assert(got == brute, s"threshold=$th: got=${got.size} " +
        s"brute=${brute.size} missing=${(brute -- got).take(5)} " +
        s"extra=${(got -- brute).take(5)}")
    }
  }

  test("jaccardSimilarityJoin: prefix filter prunes — candidate pairs " +
    "well under the quadratic count on a mixed corpus") {
    // 40 docs in 4 disjoint vocab families: cross-family pairs share no
    // tokens, so prefix-token grouping must never pair them
    val fams = Seq(
      Seq("a1", "a2", "a3", "a4", "a5", "a6"),
      Seq("b1", "b2", "b3", "b4", "b5", "b6"),
      Seq("c1", "c2", "c3", "c4", "c5", "c6"),
      Seq("d1", "d2", "d3", "d4", "d5", "d6"))
    val docs = (0 until 40).map { i =>
      val f = fams(i % 4)
      (i.toLong, (0 until 6).map(k => f((i / 4 + k) % 6)).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val out = Dedup.jaccardSimilarityJoin(df, "doc_id", "text", 0.4)
      .select("id1", "id2").as[(Long, Long)].collect()
    // every emitted pair is same-family (disjoint vocab can't overlap)
    assert(out.forall { case (a, b) => a % 4 == b % 4 })
    // and the output is far below the 780-pair quadratic ceiling
    assert(out.length < 200)
  }

  test("jaccardSimilarityJoin: maxTokenBucket recall concession is " +
    "OBSERVED — dropped_rows counts the capped prefix rows") {
    // a boilerplate clique: 12 near-identical docs share every prefix
    // token, so a cap of 4 drops their buckets; 2 disjoint outlier
    // pairs survive in small buckets and keep the metrics node live
    val clique = (0 until 12).map(i =>
      (i.toLong, s"same same2 same3 same4 same5 same6 same7 tail$i"))
    val pairA = Seq((100L, "xx1 xx2 xx3 xx4 xx5"), (101L, "xx1 xx2 xx3 xx4 xx5"))
    val pairB = Seq((200L, "yy1 yy2 yy3 yy4 yy5"), (201L, "yy1 yy2 yy3 yy4 yy5"))
    val df = (clique ++ pairA ++ pairB).toDF("doc_id", "text")
    val obs = org.apache.spark.sql.Observation("jaccard_cap")
    val capped = Dedup.jaccardSimilarityJoin(df, "doc_id", "text", 0.7,
        maxTokenBucket = 4, obs = Some(obs))
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // the outlier pairs are found; the clique's pairs were conceded
    assert(capped.contains((100L, 101L)) && capped.contains((200L, 201L)))
    assert(!capped.exists { case (a, b) => a < 12 && b < 12 }, capped)
    val m = obs.get
    assert(m("dropped_rows").asInstanceOf[Long] > 0L, m.toString)
    assert(m("max_bucket").asInstanceOf[Long] >= 12L, m.toString)
    // uncapped run on the same corpus finds the clique — the cap (not
    // the filters) is what conceded it, and without a cap nothing drops
    val obs2 = org.apache.spark.sql.Observation("jaccard_uncapped")
    val full = Dedup.jaccardSimilarityJoin(df, "doc_id", "text", 0.7,
        maxTokenBucket = 1000, obs = Some(obs2))
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(full.exists { case (a, b) => a < 12 && b < 12 })
    assert(capped.subsetOf(full))
    assert(obs2.get("dropped_rows").asInstanceOf[Long] == 0L)
  }

  test("removeRepeatedBlocks: corpus-repeated blocks cut, docs " +
    "reassembled in order, fully-boilerplate docs dropped") {
    // block unit = 2 tokens; "bp bp" appears in 5 docs (>= minRepeat 4)
    // at different BLOCK positions; doc 9 is nothing but boilerplate
    val docs = Seq(
      (1L, "bp bp u1 a u1 b"),      // block 0 removed, keeps "u1 a u1 b"
      (2L, "u2 a bp bp u2 b"),      // middle block removed
      (3L, "u3 a u3 b bp bp"),      // tail block removed
      (4L, "bp bp u4 a"),
      (9L, "bp bp"),                // only boilerplate -> dropped
      (5L, "u5 a u5 b u5 c"),       // untouched (odd-length tail block)
      (6L, "bp u6 bp u6")           // "bp u6" repeats only WITHIN doc (2x
    ).toDF("doc_id", "text")        //  < minRepeat): kept
    val out = TextOps.removeRepeatedBlocks(docs, "doc_id", "text",
        blockTokens = 2, minRepeat = 4)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(
      1L -> (("u1 a u1 b", 1L)),
      2L -> (("u2 a u2 b", 1L)),
      3L -> (("u3 a u3 b", 1L)),
      4L -> (("u4 a", 1L)),
      5L -> (("u5 a u5 b u5 c", 0L)),
      6L -> (("bp u6 bp u6", 0L))), out.toString)
  }

  test("duplicateSpans: shared substring found at each doc's offset, " +
    "within-doc repeats anchor spans, short docs emit nothing") {
    val shared = (1 to 10).map(i => s"dup$i").mkString(" ") // 10 tokens
    val docs = Seq(
      (1L, s"$shared tail1 tail2"),            // shared at offset 0
      (2L, s"pre1 pre2 pre3 $shared"),         // shared at offset 3
      (3L, "self a b self a b self a b self a b self a b"), // periodic
      (4L, "too short"),                        // n < k -> no grams
      (5L, (1 to 20).map(i => s"uniq$i").mkString(" "))) // no dups
      .toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(docs, "doc_id", "text",
        k = 4, minCount = 2)
      .as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.toSeq.sortBy(_._2)).toMap
    // docs 1/2: the 10-token shared span has 7 duplicated 4-grams;
    // flanking tokens differ so the span is exactly the shared text
    assert(out(1L) == Seq((1L, 0L, 9L, 10L, 7L)), out.toString)
    assert(out(2L) == Seq((2L, 3L, 12L, 10L, 7L)), out.toString)
    // doc 3: "self a b" period 3, every 4-gram repeats within-doc ->
    // one span covering the whole 15-token doc (12 covered positions)
    assert(out(3L) == Seq((3L, 0L, 14L, 15L, 12L)), out.toString)
    assert(!out.contains(4L) && !out.contains(5L))
  }

  test("removeDuplicateSpans: covered tokens cut from ALL copies, " +
    "survivors reassembled in order, fully-covered docs dropped") {
    val shared = (1 to 10).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared tail1 tail2"),
      (2L, s"pre1 pre2 pre3 $shared"),
      (3L, shared),                       // nothing but the span
      (4L, "un1 un2 un3 un4 un5 un6"))    // untouched
      .toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(docs, "doc_id", "text",
        k = 4, minCount = 2)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // the 10 shared tokens are cut from BOTH docs (and doc 3 entirely)
    assert(out == Map(
      1L -> (("tail1 tail2", 10L)),
      2L -> (("pre1 pre2 pre3", 10L)),
      4L -> (("un1 un2 un3 un4 un5 un6", 0L))), out.toString)
  }

  test("gopherRules: each rule fires on its targeted violation; " +
    "clean doc keeps") {
    val fifty = (1 to 25).map(i => s"word$i the").mkString(" ") // 50 toks
    val docs = Seq(
      (1L, fifty + " of and"),              // 52 words, clean -> keep
      (2L, "the of short doc"),             // < minWords
      (3L, (1 to 50).map(_ => "supercalifragilisticexpialidocious the of")
        .mkString(" ")),                    // mean len (34+3+2)/3 > 10
      (4L, (1 to 30).map(_ => "1 2 3 the of").mkString(" ")), // alpha<0.8
      (5L, (1 to 30).map(_ => "#okay #nope the of")
        .mkString(" ")),                    // 60 '#' / 120 words = 0.5
      (6L, (1 to 60).map(i => s"word$i").mkString(" "))) // no stopwords
      .toDF("doc_id", "text")
    val out = TextOps.gopherRules(docs, "doc_id", "text", minWords = 50L)
      .select("doc_id", "r_word_count", "r_mean_word_len",
        "r_alpha_words", "r_symbol_ratio", "r_stopwords", "keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, true, true, true, true, true, true)))
    assert(!out(2L)._2 && !out(2L)._7)            // word count
    assert(!out(3L)._3 && !out(3L)._7)            // mean word len
    assert(!out(4L)._4 && !out(4L)._7)            // alpha fraction
    assert(!out(5L)._5 && !out(5L)._7)            // symbol ratio
    assert(!out(6L)._6 && !out(6L)._7)            // stopwords
    // measurements surfaced: doc 2 has 4 words, 2 distinct stopwords
    val m = TextOps.gopherRules(docs, "doc_id", "text")
      .filter($"doc_id" === 2L)
      .select("n_words", "stop_hits").as[(Long, Long)].head()
    assert(m == ((4L, 2L)))
  }

  test("bm25: matches the formula computed directly; only matching " +
    "docs emit rows") {
    val docs = Seq(
      (1L, "spark join spark x y z"),
      (2L, "join a b c d e f g"),
      (3L, "nothing relevant here at all"),
      (4L, "spark spark spark")).toDF("doc_id", "text")
    val terms = Seq("spark", "join")
    val (k1, b) = (1.2, 0.75)
    val toks = Seq(
      1L -> Seq("spark", "join", "spark", "x", "y", "z"),
      2L -> Seq("join", "a", "b", "c", "d", "e", "f", "g"),
      3L -> Seq("nothing", "relevant", "here", "at", "all"),
      4L -> Seq("spark", "spark", "spark"))
    val n = toks.size
    val avgdl = toks.map(_._2.size).sum.toDouble / n
    val dfm = terms.map(t => t -> toks.count(_._2.contains(t))).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = toks.flatMap { case (id, w) =>
      val score = terms.flatMap { t =>
        val tf = w.count(_ == t)
        if (tf == 0) None else {
          val idf = math.log((n - dfm(t) + 0.5) / (dfm(t) + 0.5) + 1)
          Some(r6(idf * tf * (k1 + 1) /
            (tf + k1 * (1 - b + b * w.size / avgdl))))
        }
      }
      if (score.isEmpty) None else Some(id -> score.sum)
    }.toMap
    val got = TextOps.bm25(docs, "doc_id", "text", terms)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == Set(1L, 2L, 4L))
    got.foreach { case (id, s) =>
      assert(math.abs(s - expect(id)) < 1e-9, s"doc $id: $s vs ${expect(id)}")
    }
    // relevance sanity: 3x spark in a 3-token doc outranks 1x join in 8
    assert(got(4L) > got(2L))
  }

  test("tfIdf: tf counts, doc frequencies, ln(N/df) scoring") {
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = TextOps.tfIdf(docs, "doc_id", "text")
      .select("doc_id", "term", "tf", "df", "tfidf")
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out((1L, "a")) == ((2L, 2L, 0.0)))      // ln(2/2) = 0
    assert(out((1L, "b")) == ((1L, 1L, 0.693147))) // ln 2
    assert(out((2L, "a")) == ((1L, 2L, 0.0)))
    assert(out((2L, "c")) == ((1L, 1L, 0.693147)))
    assert(out.size == 4)
  }

  test("capPerGroup: quota enforced, kept set is partitioning-invariant " +
       "(hash order, not ingestion order)") {
    val df = (0L until 100L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val kept = TextOps.capPerGroup(df, Seq("g"), "id", 10)
      .select("id").as[Long].collect().toSet
    assert(kept.size == 30)
    val counts = TextOps.capPerGroup(df, Seq("g"), "id", 10)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert(counts.values.forall(_ == 10))
    // same rows kept regardless of physical layout
    val keptShuffled = TextOps.capPerGroup(df.repartition(7), Seq("g"),
      "id", 10).select("id").as[Long].collect().toSet
    assert(kept == keptShuffled)
    // under-quota groups keep everything
    val small = Seq((1L, "a"), (2L, "a")).toDF("id", "g")
    assert(TextOps.capPerGroup(small, Seq("g"), "id", 10).count() == 2)
  }

  test("chunkOverlap: overlapping windows, short tail, empty doc, " +
       "exact partition at stride == chunk") {
    val docs = Seq((1L, "a b c d e"), (2L, ""), (3L, "x"))
      .toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        explode(TextOps.chunkOverlap(col("text"), 3, 2)).as("ch"))
      .select(col("doc_id"), col("ch.chunk_idx"), col("ch.n_chunk_tokens"),
        col("ch.chunk_text"))
      .as[(Long, Int, Long, String)].collect().toSet
    assert(out == Set(
      (1L, 0, 3L, "a b c"),
      (1L, 1, 3L, "c d e"),  // overlap of chunk - stride = 1 token ("c")
      (1L, 2, 1L, "e"),      // trailing short window
      (3L, 0, 1L, "x")))     // doc 2 (zero tokens) yields no chunks
    // stride == chunk: chunks partition the token stream exactly
    val part = docs.filter("doc_id = 1")
      .select(explode(TextOps.chunkOverlap(col("text"), 2, 2)).as("ch"))
      .select(col("ch.chunk_text")).as[String].collect().toSeq
    assert(part == Seq("a b", "c d", "e"))
  }

  test("unigramSurprise: mean -ln p(token) under corpus frequencies") {
    // corpus: a×3, b×1, c×1 (T=5); surprise(a)=-ln(3/5)=0.510826,
    // surprise(b)=surprise(c)=-ln(1/5)=1.609438
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "   "))
      .toDF("doc_id", "text")
    val out = TextOps.unigramSurprise(docs, "doc_id", "text")
      .select("doc_id", "n_tokens", "mean_surprise")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(out(1L) == ((3L, 0.87703)))   // (2×0.510826 + 1.609438)/3
    assert(out(2L) == ((2L, 1.060132)))  // (0.510826 + 1.609438)/2
    assert(!out.contains(3L))            // zero-token doc yields no row
  }

  test("epochShuffle: a seeded PERMUTATION — every doc addressed once, " +
    "positions dense per shard, reproducible, re-dealt by the seed") {
    val docs = Seq.tabulate(500)(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    def run(seed: Long) = TextOps.epochShuffle(docs, "doc_id", seed, 8)
      .select("doc_id", "shard", "pos_in_shard")
      .as[(Long, Long, Long)].collect().toSeq
    val a = run(7L)
    assert(a.map(_._1).sorted == (0L until 500L)) // every doc exactly once
    a.groupBy(_._2).foreach { case (_, rows) =>   // dense 1..n per shard
      assert(rows.map(_._3).sorted == (1L to rows.size))
    }
    assert(run(7L) == a)                          // same seed: identical
    val b = run(8L).map(r => r._1 -> ((r._2, r._3))).toMap
    val moved = a.count { case (id, s, p) => b(id) != ((s, p)) }
    assert(moved > 400)                           // new seed: re-dealt
  }

  test("learnBpeMerges: learns the most frequent pair each round with a " +
    "deterministic tiebreak; greedy non-overlapping application") {
    val docs = Seq(
      (1L, "new york city hall"),
      (2L, "new york city council"),
      (3L, "new york state"),
      (4L, "york new haven"),   // reversed order: no (new, york) here
      (5L, "a a a a")           // self-pair run: greedy takes 2, not 3
    ).toDF("doc_id", "text")
    val merges = TextOps.learnBpeMerges(docs, "doc_id", "text", 3)
      .as[(Int, String, String, Long)].collect().toSeq
    // round 1: (new, york) ×3 wins (a,a ×3 ties on count; "a a" <
    // "new york" lexicographically... so (a, a) actually wins ties)
    // counts round 1: (new,york)=3, (a,a)=3, (york,city)=2, others <=1
    // tiebreak concat "a a" < "new york" -> rank 1 = (a, a)
    assert(merges(0) == ((1, "a", "a", 3L)))
    // after fusing (a,a): doc5 = ["a a", "a a"] (greedy pairs 1-2, 3-4)
    // round 2: (new,york)=3 wins; ("a a","a a")=1
    assert(merges(1) == ((2, "new", "york", 3L)))
    // after fusing: round 3 best = ("new york", city) ×2
    assert(merges(2) == ((3, "new york", "city", 2L)))
  }

  test("dsirWeights: target-domain docs score higher; arithmetic matches " +
    "the add-one LLR by hand") {
    // target (t) corpus speaks {x,y}; source background speaks {p,q};
    // a fresh doc in {x,y} must out-score one in {p,q}
    val docs = Seq(
      (1L, "x y x y", true), (2L, "x x y y", true),
      (3L, "p q p q", false), (4L, "p p q q", false),
      (5L, "x y", false), (6L, "p q", false)
    ).toDF("doc_id", "text", "is_t")
    val out = TextOps.dsirWeights(docs, "doc_id", "text", col("is_t"),
        buckets = 64)
      .select("doc_id", "log_weight", "n_tokens")
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // hand arithmetic: tokens total Ts=20, target Tt=8; with 64 buckets
    // and distinct single-char terms, buckets hold: x: ns=5 nt=4,
    // y: ns=5 nt=4, p: ns=5 nt=0, q: ns=5 nt=0 (no collisions among
    // 4 terms — verified by distinct bucket count below)
    // lr_x = lr_y = round(ln(5/72) - ln(6/84), 6) = round(ln(35/36),6)
    // lr_p = lr_q = round(ln(1/72) - ln(6/84), 6)
    val lrX = BigDecimal(math.log((4 + 1.0) / (8 + 64.0)) -
      math.log((5 + 1.0) / (20 + 64.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lrP = BigDecimal(math.log((0 + 1.0) / (8 + 64.0)) -
      math.log((5 + 1.0) / (20 + 64.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(5L)._1 == 2 * lrX && out(5L)._2 == 2L)
    assert(out(6L)._1 == 2 * lrP && out(6L)._2 == 2L)
    assert(out(5L)._1 > out(6L)._1)               // target-like wins
    // smoothing mass makes absolute levels data-dependent; the ORDER
    // target-vocab > source-vocab is the resampling contract
    assert(out(1L)._1 > out(3L)._1)
  }

  test("bpe_fuse: the compiled fuse is bit-identical to the aggregate-" +
    "HOF fold it replaced (the executable spec), edge cases included") {
    // the interpreted twin: the exact fold the learner/encoder used
    def hofFuse(arr: org.apache.spark.sql.Column, l: String,
                r: String): org.apache.spark.sql.Column =
      aggregate(arr,
        array().cast("array<string>"),
        (acc, x) => when(
          size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1),
            array(lit(l + " " + r))))
          .otherwise(concat(acc, array(x))))
    val docs = Seq(
      "a b a b c",      // two fuses
      "a a a a",        // self-pair run: greedy non-overlap takes 2
      "b a",            // reversed: no fuse
      "a",              // single token
      "",               // empty
      "a b a b a b a"   // alternating run
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for ((l, r) <- Seq(("a", "b"), ("a", "a"), ("b", "c"))) {
      val both = docs.select(
        graft.functions.NativeExpressions.bpe_fuse(
          TextOps.tokens(col("text")), l, r).as("native"),
        hofFuse(TextOps.tokens(col("text")), l, r).as("hof"))
      assert(both.filter(not(col("native") <=> col("hof"))).count() == 0,
        s"native bpe_fuse diverged from the HOF twin for ($l, $r)")
    }
    // a fused atom from an earlier round fuses as a unit in a later one
    val staged = Seq((1L, "x y z")).toDF("doc_id", "text")
      .select(graft.functions.NativeExpressions.bpe_fuse(
        graft.functions.NativeExpressions.bpe_fuse(
          TextOps.tokens(col("text")), "x", "y"),
        "x y", "z").as("w"))
      .as[Seq[String]].head()
    assert(staged == Seq("x y z"))
  }

  test("applyBpeMerges: learned merges fuse greedily left-to-right, " +
    "counts reflect the encode; empty and 1-token docs pass through") {
    val docs = Seq((1L, "a b a b c"), (2L, "x"), (3L, ""))
      .toDF("doc_id", "text")
    val merges = TextOps.learnBpeMerges(docs, "doc_id", "text", 1)
    val got = TextOps.applyBpeMerges(docs, "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect().toSet
    // top pair is (a,b) n=2; "a b a b c" -> [ab, ab, c]
    assert(got == Set((1L, 5L, 3L), (2L, 1L, 1L), (3L, 0L, 0L)))
  }

  test("gloveCooccur: window-2 pairs with 1/d weights, normalized " +
    "order, self-pairs kept, minCount cut") {
    // "a b a b": pairs (i,i+1): (a,b),(b,a),(a,b) -> (a,b) n=3 w=3.0;
    // (i,i+2): (a,a) n=1 w=0.5; (b,b) n=1 w=0.5
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val all = TextOps.gloveCooccur(docs, "text", window = 2, minCount = 1)
      .as[(String, String, Long, Double)].collect().toSet
    assert(all == Set(("a", "b", 3L, 3.0), ("a", "a", 1L, 0.5),
      ("b", "b", 1L, 0.5)))
    val cut = TextOps.gloveCooccur(docs, "text", window = 2, minCount = 3)
      .as[(String, String, Long, Double)].collect().toSet
    assert(cut == Set(("a", "b", 3L, 3.0)))
  }

  test("textRank: hub term ranks first; ranks sum to 1 (no dangling " +
    "mass); deterministic across runs") {
    // star graph: hub co-occurs with x, y, z; one x-y chord.
    // Hand-checked round 1: hub .4625, x = y .214583, z .108333.
    val docs = Seq((1L, "hub x"), (2L, "hub y"), (3L, "hub z"),
      (4L, "x y")).toDF("doc_id", "text")
    val out = TextOps.textRank(docs, "text", window = 2, iters = 2,
      topK = 10).as[(String, Double)].collect().toSeq
    assert(out.head._1 == "hub" && out.length == 4)
    assert(math.abs(out.map(_._2).sum - 1.0) < 1e-4,
      s"rank mass drifted: $out")
    val again = TextOps.textRank(docs, "text", window = 2, iters = 2,
      topK = 10).as[(String, Double)].collect().toSeq
    assert(out == again)
  }

  test("phraseSearch: overlapping occurrences with repeated terms, " +
    "single-term phrase, absent phrase, == sliding-window reference") {
    val docs = Seq(
      (1L, "x a b a b a y"),   // "a b a" at 1 AND 3 (overlapping)
      (2L, "a b"),             // prefix only: no match
      (3L, "b a b a"),         // "a b a" at 1
      (4L, "a"),               // too short
      (5L, "")
    ).toDF("doc_id", "text")
    val idx = TextOps.invertedIndex(docs, "doc_id", "text")
    val phrase = Seq("a", "b", "a")
    val got = TextOps.phraseSearch(idx, "doc_id", phrase)
      .as[(Long, Long)].collect().toSet
    val ref = docs.as[(Long, String)].collect().flatMap { case (id, t) =>
      val w = t.trim.split("\\s+").filter(_.nonEmpty)
      w.indices.dropRight(phrase.size - 1)
        .filter(i => phrase.indices.forall(j => w(i + j) == phrase(j)))
        .map(i => (id, i.toLong))
    }.toSet
    assert(got == ref, s"got=$got ref=$ref")
    assert(got == Set((1L, 1L), (1L, 3L), (3L, 1L)))

    // single-term phrase degenerates to term lookup
    val one = TextOps.phraseSearch(idx, "doc_id", Seq("y"))
      .as[(Long, Long)].collect().toSet
    assert(one == Set((1L, 6L)))

    // absent phrase -> empty
    assert(TextOps.phraseSearch(idx, "doc_id", Seq("a", "z")).count() == 0L)
  }

  test("weightedSample: heavy weights dominate, zero weight excluded, " +
    "partitioning-invariant, TakeOrdered plan") {
    // one row with overwhelming weight: its key ln(u)/1e9 ~ 0 beats
    // every unit-weight key (ln(u) <= ln(u_max) < 0 for all hashes)
    val df = (1L to 200L).map(i => (i, if (i == 17L) 1000000000L else 1L))
      .toDF("id", "w")
    val top = TextOps.weightedSample(df, "id", col("w"), 10)
    val ids = top.select("id").as[Long].collect().toSet
    assert(ids.contains(17L), s"heavy row missing from $ids")
    assert(ids.size == 10)

    // zero/negative weights can never be drawn
    val z = TextOps.weightedSample(
      Seq((1L, 0L), (2L, -5L), (3L, 4L)).toDF("id", "w"),
      "id", col("w"), 10).select("id").as[Long].collect().toSeq
    assert(z == Seq(3L))

    // the selected SET is a pure function of (ids, weights)
    val a = TextOps.weightedSample(df.repartition(7), "id", col("w"), 10)
      .collect().toSeq
    val b = TextOps.weightedSample(df.repartition(1), "id", col("w"), 10)
      .collect().toSeq
    assert(a == b)

    // top-n must be TakeOrdered (per-partition top-n + driver merge),
    // never a global sort exchange
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("featureHash: colliding terms sum their counts; indices in " +
    "[0, dims); identical docs hash identically") {
    val docs = Seq((1L, "aa aa bb"), (2L, "aa aa bb"), (3L, "cc"))
      .toDF("doc_id", "text")
    val out = TextOps.featureHash(docs, "doc_id", "text", dims = 8)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.forall(r => r._2 >= 0 && r._2 < 8))
    // per-doc total tf is preserved through hashing (collisions sum)
    val perDoc = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    assert(perDoc(1L) == 3L && perDoc(3L) == 1L, perDoc.toString)
    // identical docs -> identical sparse vectors
    val v1 = rows.filter(_._1 == 1L).map(r => (r._2, r._3)).toSet
    val v2 = rows.filter(_._1 == 2L).map(r => (r._2, r._3)).toSet
    assert(v1 == v2)
  }

  test("containmentJoin: complete vs brute force; catches the " +
    "short-doc-quoted-in-long-doc pair whole-doc jaccard dilutes") {
    val quote = "alpha beta gamma delta epsilon"
    val long = quote + " " + (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, quote),                  // fully contained in doc 2
      (2L, long),
      (3L, "p q r s t u v w"),      // unrelated
      (4L, "p q r s t u v w")       // exact dup of 3 (mutual containment)
    ).toDF("doc_id", "text")
    val got = Dedup.containmentJoin(docs, "doc_id", "text",
        threshold = 0.8, shingleN = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute force on the same distinct 3-gram sets
    val sets = docs.select(col("doc_id"),
        Dedup.shingles(col("text"), 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    val brute = (for {
      a <- sets.keys; b <- sets.keys if a != b
      inter = sets(a).toSet.intersect(sets(b).toSet).size
      if inter.toDouble / sets(a).size >= 0.8 - 1e-9
    } yield (a, b)).toSet
    assert(got == brute, s"got=$got brute=$brute")
    // the asymmetric pair is present...
    assert(got.contains((1L, 2L)) && !got.contains((2L, 1L)))
    // ...while its whole-doc jaccard (3/43 grams shared) is tiny
    assert(got.contains((3L, 4L)) && got.contains((4L, 3L)))
  }

  test("docNovelty: boilerplate scores low, original text scores 1; " +
    "duplicate grams inside one doc count once") {
    val docs = Seq(
      (1L, "a b c d e"),     // grams: abc, bcd, cde
      (2L, "a b c x y"),     // shares abc with doc 1
      (3L, "p q r s t"),     // wholly original
      (4L, "a b c a b c a")  // internal repeats collapse to distinct
    ).toDF("doc_id", "text")
    val got = Dedup.docNovelty(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc1: {abc,bcd,cde}: abc shared (docs 2,4) -> 1/3 shared
    assert(got(1L) == ((3L, 1L, 0.666667)), got.toString)
    // doc3: nothing shared
    assert(got(3L) == ((3L, 0L, 1.0)))
    // doc4 grams: abc, bca, cab, abc, bca -> distinct {abc,bca,cab};
    // only abc appears elsewhere
    assert(got(4L) == ((3L, 1L, 0.666667)), got.toString)
  }

  test("overlapMatrix: hand-computed shared grams and overlap " +
    "coefficient; disjoint sources emit no row") {
    val docs = Seq(
      (1L, "a b c d", "s1"),
      (2L, "a b c e", "s2"),
      (3L, "a b c d", "s1"), // duplicate doc: grams stay DISTINCT per source
      (4L, "x y z w", "s3")
    ).toDF("doc_id", "text", "source")
    val got = Dedup.overlapMatrix(docs, "source", "text", n = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // s1 grams {a b c, b c d}, s2 grams {a b c, b c e} -> 1 shared,
    // coef 1/min(2,2) = 0.5 ; s3 shares nothing -> absent
    assert(got == Map(("s1", "s2") -> ((1L, 0.5))), got.toString)
  }

  test("rrfFuse: both-arms candidate outranks a higher single-arm " +
    "rank; contributions hand-computed") {
    val lex = Seq((10L, 5.0), (20L, 4.0), (30L, 3.0)).toDF("id", "s")
    val sem = Seq((20L, 0.9), (40L, 0.8)).toDF("id", "s")
    val got = TextOps.rrfFuse(Seq((lex, "id", "s"), (sem, "id", "s")),
        rrfK = 60, topN = 10, outId = "doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // 20: rank 2 lex + rank 1 sem = 1/62 + 1/61 = .016129 + .016393
    //   = .032522 ; 10: 1/61 = .016393 ; 40: 1/62 = .016129 ;
    // 30: 1/63 = .015873
    assert(got.map(_._1).toSeq == Seq(20L, 10L, 40L, 30L), got.toSeq)
    assert(got.head == ((20L, 0.032522, 2L)), got.head)
    assert(got.map(t => t._1 -> t._3).toMap ==
      Map(20L -> 2L, 10L -> 1L, 40L -> 1L, 30L -> 1L))
  }

  test("naiveBayesClassify: separable corpus classified correctly; " +
    "unseen terms smoothed; zero-token docs dropped") {
    val docs = Seq(
      (1L, "alpha alpha beta", "A"),
      (2L, "alpha beta beta alpha", "A"),
      (3L, "gamma delta gamma", "B"),
      (4L, "delta delta gamma", "B"),
      // test-like rows: vocabulary of one class only
      (5L, "alpha beta", "A"),
      (6L, "gamma delta", "B"),
      // mixed doc with an A-majority and a term unseen anywhere in B
      (7L, "alpha alpha gamma", "A"),
      (8L, "   ", "A") // zero tokens -> no row
    ).toDF("doc_id", "text", "source")
    val out = TextOps.naiveBayesClassify(docs, "doc_id", "text", "source")
    val got = out.collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(4))).toMap
    assert(!got.contains(8L), "zero-token doc must be dropped")
    assert(got(1L) == (("A", true)) && got(3L) == (("B", true)))
    assert(got(5L) == (("A", true)) && got(6L) == (("B", true)))
    assert(got(7L)._1 == "A", s"mixed doc misclassified: ${got(7L)}")
    // every scored doc carries its actual label for the audit
    assert(out.columns.toSeq == Seq("doc_id", "label_pred", "score",
      "label_actual", "correct"))
  }

  test("codeDetect: a code snippet gates true, prose false; " +
    "hand-computed ratios on a controlled string") {
    val docs = Seq(
      (1L, "def f(x): return (x); import os; while (x<2) {x=x+1;}"),
      (2L, "The quiet afternoon passed slowly as the readers turned " +
        "their pages and thought about the story so far")
    ).toDF("doc_id", "text")
    val got = TextOps.codeDetect(docs, "doc_id", "text")
      .as[(Long, Double, Double, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1: n=53; symbols {}()[];=<> -> ( ) : no... count {,},(,),;,=,<
    //   "(x)" 2 + ";" + "(x<2)" => verified by replication below
    val s1 = docs.as[(Long, String)].collect().toMap.apply(1L)
    val sym = s1.count(c => "{}()[];=<>".contains(c)).toLong
    val dig = s1.count(_.isDigit).toLong
    val kws = Set("def", "class", "return", "import", "if", "for",
      "while", "function", "var", "const", "void", "int")
    val kw = s1.toLowerCase.trim.split("\\s+").count(kws.contains)
    val n = s1.length.toDouble
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expScore = r6(0.5 * math.min(1.0, 8.0 * (sym / n)) +
      0.2 * math.min(1.0, 5.0 * (dig / n)) +
      0.3 * math.min(1.0, kw / 3.0))
    assert(got(1L) == ((1L, r6(sym / n), r6(dig / n), kw.toLong,
      expScore, expScore >= 0.5)), got(1L).toString)
    assert(got(1L)._6, "code snippet must gate true")
    assert(!got(2L)._6 && got(2L)._4 == 0L, got(2L).toString)
  }

  test("augmentText: scalar replication of the hash-selected " +
    "swap-then-delete; deterministic across runs; counts reconcile") {
    val docs = Seq((7L, "a b c d e f g h i j k"), (8L, "x"),
      (9L, "   ")).toDF("doc_id", "text")
    val got = TextOps.augmentText(docs, "doc_id", "text",
        dropEvery = 10, swapEvery = 7)
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // scalar replication of the exact algorithm
    def h(doc: Long, x: Long): Long =
      Math.floorMod((doc * 31 + x) * 2654435761L, 2147483647L)
    def replay(doc: Long, text: String): (String, Long, Long, Long) = {
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      val n = toks.length
      val swapped = (0 until n).map { j =>
        val p = j / 2
        if (h(doc, p) % 7 == 0 && (j ^ 1) < n) toks(j ^ 1) else toks(j)
      }
      val nSwapped = if (n >= 2)
        2 * (0 until n / 2).count(p => h(doc, p) % 7 == 0) else 0
      val kept = swapped.zipWithIndex
        .filter { case (_, j) => h(doc, j) % 10 != 0 }.map(_._1)
      (kept.mkString(" "), n.toLong, nSwapped.toLong,
        (n - kept.length).toLong)
    }
    val (t7, n7, s7, d7) = replay(7L, "a b c d e f g h i j k")
    assert(got(7L) == ((7L, t7, n7, s7, d7)), s"${got(7L)} vs $t7")
    assert(got(7L)._3 == got(7L)._5 +
      got(7L)._2.split(" ").filter(_.nonEmpty).length,
      "n_tokens must equal kept + dropped")
    val (t8, n8, s8, d8) = replay(8L, "x")
    assert(got(8L) == ((8L, t8, n8, s8, d8)) && s8 == 0L)
    assert(!got.contains(9L), "zero-token doc dropped")
    // determinism: a second run is identical
    val again = TextOps.augmentText(docs, "doc_id", "text", 10, 7)
      .as[(Long, String, Long, Long, Long)].collect().map(r => r._1 -> r)
      .toMap
    assert(again == got)
  }

  test("proximitySearch: min distance within slop either order; " +
    "far co-occurrence and missing terms excluded") {
    val docs = Seq(
      (1L, "a b hash x join"),            // dist 2
      (2L, "join hash again hash"),       // dist 1 (reversed order)
      (3L, "hash a b c d e f g join"),    // dist 8 > slop
      (4L, "hash only here"),             // missing termB
      (5L, "join hash z hash join")       // multiple: min dist 1
    ).toDF("doc_id", "text")
    val got = TextOps.proximitySearch(docs, "doc_id", "text",
        "hash", "join", slop = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 1L, 5L -> 1L), got.toString)
  }

  test("readability: hand-computed Flesch ease and FK grade; " +
    "vowel-less words count one syllable; zero-token docs dropped") {
    val docs = Seq(
      (1L, "The cat sat. It was black!"), // W=6 S=2 Syl=6
      (2L, "tv hmm"),                     // no vowels -> 1 each
      (3L, "   ")                         // zero tokens -> dropped
    ).toDF("doc_id", "text")
    val got = TextOps.readability(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    // doc 1: ease = 206.835 - 1.015*3 - 84.6*1 = 119.19
    //        grade = 0.39*3 + 11.8*1 - 15.59 = -2.62
    assert(got(1L) == ((1L, 6L, 2L, 6L, 119.19, -2.62)), got(1L))
    // doc 2: W=2 S=1 Syl=2 -> ease = 206.835 - 2.03 - 84.6 = 120.205
    //        grade = 0.78 + 11.8 - 15.59 = -3.01
    assert(got(2L) == ((2L, 2L, 1L, 2L, 120.205, -3.01)), got(2L))
    assert(!got.contains(3L))
  }

  test("zipfFit: scalar OLS replication on a 3-term corpus; ties " +
    "rank deterministically; topN clips the fit") {
    val docs = Seq((1L, ("a " * 8 + "b " * 4 + "c c").trim))
      .toDF("doc_id", "text")
    val got = TextOps.zipfFit(docs, "text", topN = 100)
      .as[(Long, Double, Double, Double, Long, Long)].collect().head
    // scalar replication of olsFit: x/y rounded once to 6dp decimals,
    // exact-decimal moment sums, double formula, final round 6
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val xs = Seq(1, 2, 3).map(r => r6(math.log(r)))
    val ys = Seq(8, 4, 2).map(f => r6(math.log(f)))
    val n = 3.0
    val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum.toDouble
    val sxx = xs.map(a => a * a).sum.toDouble
    val syy = ys.map(a => a * a).sum.toDouble
    val num = n * sxy - sx * sy
    val varX = n * sxx - sx * sx
    val slope = num / varX
    val r2 = math.pow(num / math.sqrt(varX * (n * syy - sy * sy)), 2)
    assert(got._1 == 3L && got._5 == 3L && got._6 == 14L, got)
    assert(got._2 == r6(slope).toDouble, s"slope ${got._2}")
    assert(got._3 == r6((sy - slope * sx) / n).toDouble, got)
    assert(got._4 == r6(r2).toDouble, got)
    // slope must be negative (frequency falls with rank) and the
    // halving sequence is slightly convex in log-log, so r2 < 1
    assert(got._2 < 0 && got._4 > 0.9 && got._4 < 1.0, got)
    // topN = 2 keeps only ranks 1-2: a perfect 2-point fit, r2 = 1
    val two = TextOps.zipfFit(docs, "text", topN = 2)
      .as[(Long, Double, Double, Double, Long, Long)].collect().head
    assert(two._1 == 2L && two._4 == 1.0, two)
  }

  test("naiveBayesClassify saltHotTerms: stopword at ~50% of postings " +
    "salted through the replicated grid, results bit-identical") {
    // 200 docs; every doc carries the stopword "the" (so "the" is ~50%
    // of all postings); class signal lives in the other term
    val docs = (1L to 200L).map { i =>
      if (i % 2 == 0) (i, "the the alpha", "A") else (i, "the the gamma", "B")
    }.toDF("doc_id", "text", "source")
    val plain = TextOps.naiveBayesClassify(docs, "doc_id", "text", "source")
      .orderBy("doc_id")
      .as[(Long, String, Double, String, Boolean)].collect().toSeq
    val salted = TextOps.naiveBayesClassify(docs, "doc_id", "text",
        "source", saltHotTerms = 1, salts = 8)
      .orderBy("doc_id")
      .as[(Long, String, Double, String, Boolean)].collect().toSeq
    // order-free decimal sums make the salted union bit-identical
    assert(salted == plain, "salted plan must not change any score")
    assert(plain.forall(_._5), "separable corpus must classify clean")
    // the hot path actually engages: the salt column is in the plan
    val saltedPlan = TextOps.naiveBayesClassify(docs, "doc_id", "text",
      "source", saltHotTerms = 1, salts = 8)
      .queryExecution.optimizedPlan.toString
    assert(saltedPlan.contains("__graft_salt"),
      "expected the salted join route in the optimized plan")
  }

  test("jsDivergence: identical groups 0, disjoint groups ln 2, " +
    "partial overlap matches the scalar reference, symmetric pairs") {
    val docs = Seq(
      ("g1", "a a b"), ("g2", "a b b b"), ("g3", "z"), ("g4", "a a b")
    ).toDF("lang", "text")
    val got = TextOps.jsDivergence(docs, "text", "lang")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got.size == 6)
    // scalar reference mirroring the relational split (intersection
    // contributions + ln2 * exclusive mass)
    def ref(p: Map[String, Double], q: Map[String, Double]): Double = {
      val common = (p.keySet & q.keySet).toSeq
      def r6(x: Double) = math.rint(x * 1e6) / 1e6
      val ci = common.map { t =>
        val a = p(t); val b = q(t)
        r6(a * math.log(2 * a / (a + b)) + b * math.log(2 * b / (a + b)))
      }.sum
      val sa = common.map(t => r6(p(t))).sum
      val sb = common.map(t => r6(q(t))).sum
      (ci + math.log(2) * ((1 - sa) + (1 - sb))) / 2
    }
    val d1 = Map("a" -> 2.0 / 3, "b" -> 1.0 / 3)
    val d2 = Map("a" -> 0.25, "b" -> 0.75)
    assert(got(("g1", "g4")) == ((2L, 0.0)), "identical dists")
    assert(got(("g1", "g3")) == ((0L, 0.693147)), "disjoint = ln 2")
    assert(got(("g2", "g3")) == ((0L, 0.693147)))
    assert(got(("g3", "g4")) == ((0L, 0.693147)))
    assert(math.abs(got(("g1", "g2"))._2 - ref(d1, d2)) < 1e-6)
    assert(got(("g1", "g2")) == got(("g2", "g4")),
      "g4 duplicates g1: pair values must agree")
  }

  test("pmiCollocations: the repeated phrase tops the ranking with " +
    "the hand-computed slot-marginal PMI; support filter prunes; " +
    "single-token docs contribute nothing") {
    val docs = (Seq.fill(6)("new york is big") ++
      Seq.fill(4)("big apple city") :+ "solo").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextOps.pmiCollocations(docs, "text", minCount = 4,
        topN = 10)
      .as[(String, String, Long, Double)].collect().toSeq
    // bigrams: (new,york) 6, (york,is) 6, (is,big) 6, (big,apple) 4,
    // (apple,city) 4 -> B = 26
    // pmi(new,york) = ln(6*26 / (6*6)) = ln(26/6) = 1.466337
    val byPair = got.map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(byPair(("new", "york")) == ((6L, 1.466337)),
      byPair.toString)
    // (big,apple): big appears first in 4+? big->apple 4; ca(big)=4
    // (big is also SECOND in is->big); cb(apple)=4:
    // ln(4*26/(4*4)) = ln(26/4) = 1.871802
    assert(byPair(("big", "apple")) == ((4L, 1.871802)),
      byPair.toString)
    assert(got.map(_._3).forall(_ >= 4), "support filter")
    assert(!got.exists(p2 => p2._1 == "solo" || p2._2 == "solo"),
      "single-token doc contributes no bigram")
    // ranking: pmi desc then word tiebreak
    assert(got == got.sortBy(r => (-r._4, r._1, r._2)), got.toString)
  }

  test("rakeKeywords: hand-computed degree/freq word scores and " +
    "phrase sums; stopwords segment phrases; adjacent stopwords and " +
    "punctuation collapse; maxPhraseLen prunes") {
    import spark.implicits._
    // cleaned/segmented phrases: "deep learning", "deep", "models"
    // (the 'of'/'and' boundaries; punctuation collapses with the
    // stopword to one boundary)
    val docs = Seq(
      "Deep learning of the deep, and MODELS!",
      "deep learning and models").toDF("text")
    val got = graft.text.TextOps.rakeKeywords(docs, "text", topK = 10)
      .as[(String, Int, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // phrases: doc1: [deep learning], [deep], [models];
    //          doc2: [deep learning], [models]
    // word stats: deep: freq 3 (2 in 2-phrases + 1 alone),
    //   deg = 2+2+1 = 5 -> 5/3; learning: freq 2, deg 4 -> 2;
    //   models: freq 2, deg 2 -> 1
    val dScore = BigDecimal(5.0 / 3).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("deep learning") ==
      ((2, 2L, dScore + 2.0)), got.toString)
    assert(got("deep") == ((1, 1L, dScore)), got.toString)
    assert(got("models") == ((1, 2L, 1.0)), got.toString)
    // a long run beyond maxPhraseLen is pruned whole
    val long = Seq("alpha beta gamma delta epsilon").toDF("text")
    assert(graft.text.TextOps.rakeKeywords(long, "text",
      maxPhraseLen = 4).count() == 0)
    assert(graft.text.TextOps.rakeKeywords(long, "text",
      maxPhraseLen = 5).count() == 1)
  }

  test("vocabCoverage: Good-Turing unseen mass, Chao1, hapax ratio " +
    "on a hand corpus; null text excluded; empty corpus is zeros") {
    // freqs: a=3, b=2, c=d=e=1 -> N=8, V=5, N1=3, N2=1
    val docs = Seq((1L, Some("a a a b b c")), (2L, Some("d e")),
      (3L, None)).toDF("doc_id", "text")
    val got = TextOps.vocabCoverage(docs, "text")
      .as[(Long, Long, Long, Long, Double, Double, Double)]
      .collect().head
    assert(got._1 == 8L && got._2 == 5L && got._3 == 3L &&
      got._4 == 1L)
    assert(got._5 == 0.375) // 3/8
    assert(got._6 == 6.5)   // 5 + 3*2/(2*(1+1))
    assert(got._7 == 0.6)   // 3/5
    // empty corpus: exact zeros, ratio columns null
    val empty = Seq((1L, "")).toDF("doc_id", "text")
    val e = TextOps.vocabCoverage(empty, "text").collect().head
    assert(e.getLong(0) == 0L && e.getLong(1) == 0L)
    assert(e.isNullAt(4) && e.getDouble(5) == 0.0 && e.isNullAt(6))
  }

  test("heapsFit: scalar OLS replication of the first-occurrence " +
    "growth curve; totals and point count") {
    // d1 "a b" -> (2,2); d2 "a c" -> (4,3); d3 "a b" -> (6,3)
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "a b"))
      .toDF("doc_id", "text")
    val got = TextOps.heapsFit(docs, "text", "doc_id")
      .as[(Long, Double, Double, Double, Long, Long)].collect().head
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val xs = Seq(2, 4, 6).map(n => r6(math.log(n)))
    val ys = Seq(2, 3, 3).map(v => r6(math.log(v)))
    val n = 3.0
    val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum.toDouble
    val sxx = xs.map(a => a * a).sum.toDouble
    val syy = ys.map(a => a * a).sum.toDouble
    val num = n * sxy - sx * sy
    val varX = n * sxx - sx * sx
    val slope = num / varX
    val r2 = math.pow(num / math.sqrt(varX * (n * syy - sy * sy)), 2)
    assert(got._1 == 3L)
    assert(got._2 == r6(slope).toDouble)
    assert(got._3 == r6((sy - slope * sx) / n).toDouble)
    assert(got._4 == r6(r2).toDouble)
    assert(got._5 == 3L && got._6 == 6L)
    // beta for a growing-vocab curve sits in (0, 1)
    assert(got._2 > 0.0 && got._2 < 1.0)
  }

  test("bigramSurprise: seen bigrams score the ln context ratio, " +
    "unseen back off to Laplace unigrams (OOV floored); short docs " +
    "emit no row") {
    // ref "a b a b": cb(a,b)=2 cu(a)=2, cb(b,a)=1 cu(b)=1;
    // unigrams a=2 b=2, N=4 V=2
    val ref = Seq((0L, "a b a b")).toDF("doc_id", "text")
    val tgt = Seq((1L, "a b c"), (3L, "z"), (5L, "b b"))
      .toDF("doc_id", "text")
    val got = TextOps.bigramSurprise(tgt, ref, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // (a,b) seen: -ln(2/2)=0; (b,c) unseen, c OOV: -ln(0.4*(1/6))
    val sOov = r6(-math.log(0.4 * (1.0 / 6.0)))
    assert(got(1L)._2 == 2L && got(1L)._3 == 1L)
    assert(got(1L)._4 ==
      r6((BigDecimal(0.0) + BigDecimal(sOov)).toDouble / 2.0),
      got(1L).toString)
    assert(!got.contains(3L)) // a 1-token doc has no bigrams
    // (b,b) unseen but b IS a reference unigram: -ln(0.4*(2+1)/6)
    val sIn = r6(-math.log(0.4 * (3.0 / 6.0)))
    assert(got(5L) == ((5L, 1L, 1L, sIn)), got(5L).toString)
  }

  test("leakageSafeSplit: clusters never straddle the boundary; " +
    "deterministic across runs and row order; boundary shares") {
    // 40 clusters x 3 rows each
    val df = (1L to 120L).map(i => (i, i % 40))
      .toDF("row_id", "cl")
    val s1 = TextOps.leakageSafeSplit(df, "cl", 300000L)
      .select("cl", "split").as[(Long, String)].collect()
    // each cluster maps to exactly ONE split
    val perCluster = s1.groupBy(_._1).values
      .map(_.map(_._2).distinct.length)
    assert(perCluster.forall(_ == 1))
    assert(s1.map(_._2).distinct.sorted.toSeq == Seq("test", "train"))
    val s2 = TextOps.leakageSafeSplit(df.orderBy(rand(3)), "cl",
        300000L)
      .select("cl", "split").as[(Long, String)].collect().toSet
    assert(s1.toSet == s2)
    // boundary shares: 0 -> all train, 1e6 -> all test
    assert(TextOps.leakageSafeSplit(df, "cl", 0L)
      .filter(col("split") === "test").count() == 0)
    assert(TextOps.leakageSafeSplit(df, "cl", 1000000L)
      .filter(col("split") === "train").count() == 0)
  }

  test("distinctiveTerms: scalar replication of the smoothed " +
    "log-odds z; per-group ranking; minCount prunes before scoring") {
    // A: x*5 y*1; B: y*5 z*1 -> N=12, ng=6 each
    val docs = Seq(("A", "x x x x x y"), ("B", "y y y y y z"))
      .toDF("src", "text")
    val got = TextOps.distinctiveTerms(docs, "text", "src",
        topK = 2, minCount = 1L)
      .as[(String, String, Long, Double, Double)].collect()
      .groupBy(_._1)
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def zOf(a: Long, b: Long, c: Long, d: Long): (Double, Double) = {
      val (ha, hb, hc, hd) = (a + 0.5, b + 0.5, c + 0.5, d + 0.5)
      val l = math.log(ha * hd / (hb * hc))
      val v = 1.0 / ha + 1.0 / hb + 1.0 / hc + 1.0 / hd
      (r6(l), r6(l / math.sqrt(v)))
    }
    // (A, x): a=5, b=1, c=0, d=6
    val ax = got("A").find(_._2 == "x").get
    val (lorAx, zAx) = zOf(5, 1, 0, 6)
    assert(ax._3 == 5L && ax._4 == lorAx && ax._5 == zAx,
      ax.toString)
    // A's top term is x (positive z), and (A, y) scores NEGATIVE
    assert(got("A").maxBy(_._5)._2 == "x")
    val ay = got("A").find(_._2 == "y").get
    assert(ay._5 < 0.0, ay.toString)
    // B's top term is y: a=5,b=1,c=1,d=5 beats z's a=1,b=5,c=0,d=6
    assert(got("B").maxBy(_._5)._2 == "y")
    // minCount prunes: with minCount=5 only the two 5-count cells
    val pruned = TextOps.distinctiveTerms(docs, "text", "src",
        topK = 5, minCount = 5L).collect()
    assert(pruned.length == 2, pruned.mkString(","))
  }

  test("sourceDivergence: identical distributions score 0; zero " +
    "shared vocabulary scores exactly ln 2 (pair still emitted); " +
    "partial overlap matches the scalar chain") {
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val same = Seq(("A", "x y"), ("B", "x y")).toDF("src", "text")
    val s = TextOps.sourceDivergence(same, "text", "src")
      .as[(String, String, Long, Double, Double)].collect().head
    assert(s == (("A", "B", 2L, 0.0, 0.0)), s.toString)
    val disjoint = Seq(("A", "x x"), ("B", "y y")).toDF("src", "text")
    val d = TextOps.sourceDivergence(disjoint, "text", "src")
      .as[(String, String, Long, Double, Double)].collect().head
    assert(d._3 == 0L && d._4 == r6(math.log(2.0)) && d._5 == 1.0,
      d.toString)
    // A = {x:2/3, y:1/3}, B = {x:1/2, z:1/2}: common term x only
    val part = Seq(("A", "x x y"), ("B", "x z")).toDF("src", "text")
    val p = TextOps.sourceDivergence(part, "text", "src")
      .as[(String, String, Long, Double, Double)].collect().head
    val (pa, pb) = (2.0 / 3.0, 1.0 / 2.0)
    val tm = r6((pa * math.log(2 * pa / (pa + pb)) +
      pb * math.log(2 * pb / (pa + pb))) / 2)
    val miss = r6(math.log(2.0) / 2 * (1.0 / 3.0 + 1.0 / 2.0))
    val js = BigDecimal(tm) + BigDecimal(miss)
    assert(p._3 == 1L && p._4 == js.toDouble &&
      p._5 == r6(js.toDouble / math.log(2.0)), p.toString)
  }

  test("heapsFit: zero-token docs keep the vocab flat; leading " +
    "empty doc is excluded from the fit frame") {
    val docs = Seq((1L, ""), (2L, "a b"), (3L, ""), (4L, "c"))
      .toDF("doc_id", "text")
    val got = TextOps.heapsFit(docs, "text", "doc_id").collect().head
    // curve points: d1 (0,0) filtered; d2 (2,2); d3 (2,2); d4 (3,3)
    assert(got.getLong(0) == 3L)
    assert(got.getLong(4) == 3L && got.getLong(5) == 3L)
  }

  test("bleuCorpus: identical text scores 1; a pure-prefix candidate " +
    "scores exactly the brevity penalty; any zero-match order kills " +
    "the geometric mean to 0") {
    def bleu(pairs: Seq[(Long, String, String)]) =
      TextOps.bleuCorpus(pairs.toDF("id", "cand", "ref"), "id",
        col("cand"), col("ref")).collect().head
    val same = bleu(Seq((1L, "a b c d e", "a b c d e")))
    assert(same.getAs[Double]("bleu") == 1.0 &&
      same.getAs[Double]("bp") == 1.0)
    assert(same.getAs[Long]("m4") == 2L && same.getAs[Long]("t4") == 2L)
    // candidate = reference minus its last token: every candidate
    // n-gram matches (p_n = 1), so bleu == bp == exp(1 - 5/4)
    val pref = bleu(Seq((1L, "a b c d", "a b c d e")))
    assert(pref.getAs[Double]("bp") == 0.778801)
    assert(pref.getAs[Double]("bleu") == 0.778801)
    // shared unigrams but no shared 4-gram -> bleu 0, exact zero
    val zero = bleu(Seq((1L, "a x b y c z d", "a b c d e f g")))
    assert(zero.getAs[Long]("m4") == 0L)
    assert(zero.getAs[Double]("bleu") == 0.0)
  }

  test("bleuCorpus: clipping caps a repeated candidate gram at its " +
    "reference count, and matches sum over the corpus (not per doc)") {
    val out = TextOps.bleuCorpus(Seq(
      (1L, "the the the", "the cat"), // m1 clipped to 1 of 3
      (2L, "big dog", "big dog")      // m1 = 2 of 2
    ).toDF("id", "cand", "ref"), "id", col("cand"), col("ref"))
      .collect().head
    assert(out.getAs[Long]("m1") == 3L && out.getAs[Long]("t1") == 5L)
    assert(out.getAs[Long]("cand_len") == 5L &&
      out.getAs[Long]("ref_len") == 4L)
    // corpus has a zero 3-gram order (no doc has 3 candidate tokens
    // matching) -> bleu 0 despite nonzero unigram overlap
    assert(out.getAs[Double]("bleu") == 0.0)
  }

  test("rougeN: clipped precision/recall and the exact-fraction F1 " +
    "(2m/(ct+rt)); a 1-token candidate has no ord-2 row") {
    val out = TextOps.rougeN(Seq(
      (1L, "the the the", "the cat"),
      (2L, "solo", "solo ref here")
    ).toDF("id", "cand", "ref"), "id", col("cand"), col("ref"))
      .collect().map(r => ((r.getAs[Long]("id"), r.getAs[Long]("ord")),
        r)).toMap
    val r11 = out((1L, 1L))
    assert(r11.getAs[Long]("n_match") == 1L)     // 'the' clipped to 1
    assert(r11.getAs[Double]("precision") == 0.333333)
    assert(r11.getAs[Double]("recall") == 0.5)
    assert(r11.getAs[Double]("f1") == 0.4)       // 2·1/(3+2), one div
    val r12 = out((1L, 2L))
    assert(r12.getAs[Long]("n_match") == 0L &&   // 'the the' ∉ ref
      r12.getAs[Double]("f1") == 0.0)
    assert(out.contains((2L, 1L)) && !out.contains((2L, 2L)),
      "a 1-token candidate must have no bigram row")
    val r21 = out((2L, 1L))
    assert(r21.getAs[Double]("recall") == 0.333333 &&
      r21.getAs[Double]("precision") == 1.0)
  }

  test("chrF: identical text scores 1 over the present orders; spaces " +
    "are stripped before gramming; the half-away micro mean matches " +
    "the hand value; β=2 weights recall; short texts cap n_orders") {
    def chrf(pairs: Seq[(Long, String, String)]) =
      TextOps.chrF(pairs.toDF("id", "cand", "ref"), "id",
        col("cand"), col("ref"))
        .collect().map(r => r.getAs[Long]("id") -> r).toMap
    val out = chrf(Seq(
      (1L, "abcdef", "abcdef"),   // all 6 orders, perfect
      (2L, "abc", "abc"),         // len 3 → only orders 1..3
      (3L, "a b c d", "abcx"),    // spaces stripped → 'abcd' vs 'abcx'
      (4L, "ab", "abcd")))        // precision 1, recall low → β bites
    assert(out(1L).getAs[Long]("n_orders") == 6L &&
      out(1L).getAs[Double]("chrf") == 1.0 &&
      out(1L).getAs[Double]("chr_p") == 1.0)
    assert(out(2L).getAs[Long]("n_orders") == 3L &&
      out(2L).getAs[Double]("chrf") == 1.0)
    // 'abcd' vs 'abcx': P_n = R_n = (.75, .666667, .5, 0) over 4
    // orders → micro mean halfAway(1916667, 4) = 479167; P == R makes
    // chrF collapse to that same value (5P²/5P)
    assert(out(3L).getAs[Long]("n_orders") == 4L, out(3L).toString)
    assert(out(3L).getAs[Double]("chr_p") == 0.479167)
    assert(out(3L).getAs[Double]("chr_r") == 0.479167)
    assert(out(3L).getAs[Double]("chrf") == 0.479167)
    // 'ab' vs 'abcd': only the candidate's 2 orders average; P = 1,
    // R = halfAway(500000 + 333333, 2)/1e6 = 0.416667, and β=2 pulls
    // chrF well below the arithmetic midpoint, toward recall
    val r4 = out(4L)
    assert(r4.getAs[Long]("n_orders") == 2L)
    assert(r4.getAs[Double]("chr_p") == 1.0)
    assert(r4.getAs[Double]("chr_r") == 0.416667)
    val expect = java.math.BigDecimal.valueOf(
        5.0 * 1.0 * 0.416667 / (4.0 * 1.0 + 0.416667))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(r4.getAs[Double]("chrf") == expect &&
      r4.getAs[Double]("chrf") < 0.708334, r4.toString)
  }

  test("canonicalizeUrl: scheme/host case, www., default ports, " +
    "fragments, tracking params, param order and trailing slash all " +
    "collapse; non-default ports, path case and real params survive; " +
    "non-URLs pass through") {
    import spark.implicits._
    def canon(u: String): String =
      Seq(u).toDF("u")
        .select(TextOps.canonicalizeUrl(col("u")).as("c"))
        .as[String].collect().head
    val base = "https://ex.com/A/b?a=1&b=2"
    // the seven collapse classes
    assert(canon("HTTPS://WWW.EX.COM/A/b?a=1&b=2") == base)
    assert(canon("https://ex.com:443/A/b?a=1&b=2") == base)
    assert(canon("https://ex.com/A/b?b=2&a=1") == base)
    assert(canon("https://ex.com/A/b?utm_source=x&a=1&b=2&gclid=9") ==
      base)
    assert(canon("https://ex.com/A/b?a=1&b=2#frag") == base)
    assert(canon("  https://ex.com/A/b?a=1&b=2  ") == base)
    assert(canon("https://www.ex.com/A/b/?a=1&b=2") ==
      "https://ex.com/A/b?a=1&b=2")
    assert(canon("http://ex.com:80/x") == "http://ex.com/x")
    // distinctions that MUST survive
    assert(canon("https://ex.com:8443/x") == "https://ex.com:8443/x")
    assert(canon("http://ex.com:443/x") == "http://ex.com:443/x")
    assert(canon("https://ex.com/A") != canon("https://ex.com/a"))
    assert(canon("https://ex.com/x?c=3") == "https://ex.com/x?c=3")
    // tracking-only query drops its '?'; root slash normalizes away
    assert(canon("https://ex.com/?utm_campaign=y") == "https://ex.com")
    assert(canon("https://ex.com/") == "https://ex.com")
    // utm prefix is anchored per-param: 'xutm_a' is a REAL param
    assert(canon("https://ex.com/x?xutm_a=1") ==
      "https://ex.com/x?xutm_a=1")
    // non-URL text passes through (literal steps only, no collision)
    assert(canon("not a url") == "not a url")
    assert(canon("ftp://MixedHost.COM/Path") == "ftp://mixedhost.com/Path")
  }

  test("canonicalizeUrl authority edges PINNED (userinfo, IPv6), " +
    "with a java.net.URI differential arm decomposing every output") {
    import spark.implicits._
    def canon(u: String): String =
      Seq(u).toDF("u")
        .select(TextOps.canonicalizeUrl(col("u")).as("c"))
        .as[String].collect().head
    // (input, expected canonical, expected (scheme, userInfo, host,
    // port, path) of the OUTPUT as java.net.URI — an independent
    // authority parser — sees it)
    val rows = Seq(
      // userinfo is part of the authority and gets LOWERCASED
      // wholesale with it (current behavior, pinned: the op's domain
      // is crawl URLs, where credentialed URLs are dedup keys, not
      // logins — case-folding them is the collapse we want)
      ("https://User:Pw@Ex.com/A",
        "https://user:pw@ex.com/A",
        ("https", "user:pw", "ex.com", -1, "/A")),
      // `www.` strips only at the AUTHORITY's start — when userinfo
      // leads the authority, a www. prefix on the USERINFO is what
      // gets dropped and a www. on the host itself survives (pinned
      // quirk of the single-regex authority rewrite)
      ("https://www.User@ex.com/x",
        "https://user@ex.com/x",
        ("https", "user", "ex.com", -1, "/x")),
      ("https://user@www.ex.com/x",
        "https://user@www.ex.com/x",
        ("https", "user", "www.ex.com", -1, "/x")),
      // default-port stripping is anchored on a colon-free host, so
      // it does NOT fire when userinfo (":" in user:pw) or an IPv6
      // literal precedes the port — pinned limitation; the port
      // survives rather than a wrong strip firing mid-authority
      ("http://user:pw@ex.com:80/x",
        "http://user:pw@ex.com:80/x",
        ("http", "user:pw", "ex.com", 80, "/x")),
      ("HTTPS://[2001:DB8::1]:443/x",
        "https://[2001:db8::1]:443/x",
        ("https", null, "[2001:db8::1]", 443, "/x")),
      // bracketed IPv6 hosts otherwise canonicalize like any other:
      // case folds, fragment drops, params sort
      ("https://[2001:DB8::1]/x?b=2&a=1#f",
        "https://[2001:db8::1]/x?a=1&b=2",
        ("https", null, "[2001:db8::1]", -1, "/x")))
    rows.foreach { case (in, expect, (sch, ui, host, port, path)) =>
      val c = canon(in)
      assert(c == expect, s"canon($in) = $c")
      val u = java.net.URI.create(c)
      assert(u.getScheme == sch && u.getUserInfo == ui &&
        u.getHost == host && u.getPort == port && u.getPath == path,
        s"URI($c) = (${u.getScheme},${u.getUserInfo},${u.getHost}," +
          s"${u.getPort},${u.getPath})")
    }
  }
}
