package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join operators (SURVEY.md §2.3 J1–J7).
  *
  * The reference's joins are all fact ⋈ small-vocab or fact ⋈ fact on the
  * entity key. Scale rules encoded here: dimension sides are broadcast
  * explicitly (no shuffle of the fact table); fact⋈fact joins shuffle on
  * the entity key, the same partitioning the window ops reuse.
  */
object Joins {

  /** J1/J2: left equi-join with an explicitly broadcast dimension side.
    * (`code/RCLIF_vitals.Rmd:41`, `code/RCLIF_labs.Rmd:46`.)
    *
    * SIZE CONTRACT: `dim` must be a TRUE dimension — bounded-cardinality
    * vocab/lookup content (nation, region, the vocab sheets) that stays
    * executor-memory-sized at any fact scale. A side that grows with the
    * fact (customer, a filtered fact subset) must NOT take this hint: at
    * 100× it OOMs the executors building the broadcast. For those, use a
    * plain unhinted join (or [[semi]]/[[anti]]) and let
    * AQE/`autoBroadcastJoinThreshold` decide at runtime. */
  def broadcastLeft(fact: DataFrame, dim: DataFrame,
                    keys: Seq[String]): DataFrame =
    fact.join(broadcast(dim), keys, "left")

  /** J5: left semi — filter fact to rows with a match, adding no columns
    * (`code/RCLIF_medications.Rmd:146,189`). Deliberately UNHINTED: the
    * filter side is often a fact fraction (e.g. customers over a balance
    * threshold) that grows with the data, so a hard broadcast would OOM
    * at scale. AQE still picks a broadcast at runtime whenever the side
    * measures under `autoBroadcastJoinThreshold`; otherwise the
    * scale-safe shuffled hash/sort-merge join on the key. */
  def semi(fact: DataFrame, filterTo: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(filterTo, keys, "left_semi")

  /** Anti-join: rows with NO match (QC `setdiff`-style checks).
    * Unhinted for the same reason as [[semi]]. */
  def anti(fact: DataFrame, except: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(except, keys, "left_anti")

  /** J4: full outer join keeping unmatched rows from both sides
    * (`code/RCLIF_vitals.Rmd:124`). */
  def fullOuter(l: DataFrame, r: DataFrame, keys: Seq[String]): DataFrame =
    l.join(r, keys, "full_outer")

  /** Escape a string column's value for literal use inside a Java regex.
    * Pure Catalyst (no UDF): wraps the value in \Q...\E and neutralizes any
    * embedded \E, exactly what java.util.regex.Pattern.quote does.
    */
  def regexQuote(c: Column): Column =
    concat(lit("\\Q"), regexp_replace(c, "\\\\E", "\\\\E\\\\\\\\E\\\\Q"), lit("\\E"))

  /** J6: regex theta-join — each vocab term matched as a whole word,
    * case-insensitively, against a text column
    * (`code/RCLIF_medications.Rmd:111-125`). Vocab side must be small: the
    * plan is a broadcast nested-loop join (cross join + non-equi regex
    * predicate), cost O(|fact| × |vocab|) regex evaluations. The reference
    * does exactly this via rowwise()+sapply; distinct-ing the fact names
    * first (as the reference does at :98-101) keeps the left side small.
    *
    * @param pattern builds the regex from the (already quoted) term column.
    */
  def regexVocabJoin(fact: DataFrame, vocab: DataFrame, textCol: String,
                     termCol: String,
                     pattern: Column => Column =
                       t => concat(lit("(?i)\\b"), t, lit("\\b")))
      : DataFrame =
    fact.crossJoin(broadcast(vocab))
      .filter(regexp_like(col(textCol), pattern(regexQuote(col(termCol)))))

  /** J7: disambiguation helper — prefix every column, so post-join
    * references are explicit instead of R's .x/.y suffixes. */
  def prefixed(df: DataFrame, prefix: String): DataFrame =
    df.toDF(df.columns.map(c => s"$prefix$c"): _*)

  /** As-of (point-in-time) join: for every left row, attach the LATEST
    * right row with rightTime <= leftTime within the same key — "the
    * most recent lab before this vital", "the active order at this
    * event". Spark has no native ASOF JOIN; the naive formulation
    * (range join + per-left-row max) is a quadratic non-equi join.
    *
    * Implementation is the scale-right union+LOCF: tag both sides, union
    * on (key, time) and carry the right payload forward with a
    * last(ignoreNulls) window — ONE shuffle on the key, linear in
    * |L|+|R|, no range explosion. Right-time ties and a right row at
    * exactly leftTime are both honored (right rows sort before left
    * rows at equal times).
    *
    * @param payload right-side columns to attach (all null when no
    *                prior right row exists — left rows are always
    *                kept). Names must not collide with left columns.
    *                The payload is carried as ONE struct through the
    *                LOCF window, so every attached column comes from
    *                the SAME right row — a newer right row with a null
    *                in one payload column attaches that null rather
    *                than back-filling it from an older row (row-wise
    *                as-of semantics, matching SQL ASOF JOIN).
    *
    * Determinism: callers must make (keys, rightTime) unique on the
    * right side (e.g. WindowOps.dedupKeepLast first) — with duplicate
    * right timestamps "the latest" is otherwise engine-arbitrary.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val leftCols = left.columns
    // right rows: tag 0 so they sort BEFORE left rows at the same time;
    // payload packed into one struct so the window carries whole rows
    val rTagged = right.select(
      keys.map(col) :+ col(rightTime).as("__t") :+ lit(0).as("__tag") :+
        struct(payload.map(col): _*).as("__p"): _*)
    val lTagged = left.select(
      (keys.map(col) :+ col(leftTime).as("__t") :+ lit(1).as("__tag")) ++
        leftCols.filterNot(c => keys.contains(c) || c == leftTime).map(col): _*)
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .withColumnRenamed("__t", leftTime)
      .select(leftCols.map(col) ++
        payload.map(p => col("__p").getField(p).as(p)): _*)
  }

  /** Point-in-time (SCD2 temporal) join: attach to each fact row the
    * dimension version whose validity interval [validFrom, validTo)
    * covers the fact's time — "the customer's segment AS OF this
    * order", the query every Type-2 history table ([[Merge.scd2Upsert]])
    * exists to answer. A BETWEEN range join would be the quadratic
    * non-equi trap; since versions are non-overlapping per key, the
    * covering version is exactly the latest validFrom ≤ factTime, so
    * this rides [[asOfJoin]]'s single-exchange union+LOCF plan, then a
    * narrow post-check nulls the payload when the matched version was
    * already CLOSED before the fact (possible only for gap histories —
    * contiguous SCD2 never triggers it). Payload attaches row-wise from
    * one version; an open version has null validTo. Right-side
    * uniqueness contract: one version per (keys, validFrom). */
  def pointInTimeJoin(facts: DataFrame, history: DataFrame,
                      keys: Seq[String], factTime: String,
                      validFromCol: String, validToCol: String,
                      payload: Seq[String]): DataFrame = {
    val joined = asOfJoin(facts, history, keys, factTime, validFromCol,
      payload :+ validToCol)
    val valid = col(validToCol).isNull ||
      col(factTime) < col(validToCol)
    joined.select(facts.columns.map(col) ++
      payload.map(p =>
        when(valid, col(p)).otherwise(lit(null)).as(p)): _*)
  }

  /** [[asOfJoin]] with a STALENESS BOUND (max lookback): a match whose
    * right time lies more than `toleranceSeconds` before the left time
    * counts as NO match — payload comes back null, exactly like a left
    * row with no prior right row. The clinical "latest lab within N
    * hours, else missing" rule (a 2-day-old lab is not the current
    * value), and the sensor-staleness guard of any LOCF feature. Also
    * attaches the matched right time as `matchedTimeCol` (null when out
    * of tolerance or absent) for age auditing. Same single-exchange
    * union+LOCF plan as [[asOfJoin]]; the staleness test is a narrow
    * post-projection on floor-epoch seconds (the cross-engine grid —
    * see WindowOps.rollingMeans). Same right-side uniqueness contract
    * as asOfJoin. */
  def asOfJoinTolerance(left: DataFrame, right: DataFrame,
                        keys: Seq[String], leftTime: String,
                        rightTime: String, payload: Seq[String],
                        toleranceSeconds: Long,
                        matchedTimeCol: String = "matched_time")
      : DataFrame = {
    require(toleranceSeconds >= 0, "toleranceSeconds must be >= 0")
    require(!payload.contains(matchedTimeCol),
      s"payload already contains $matchedTimeCol")
    val rt = right.withColumn(matchedTimeCol, col(rightTime))
    val joined = asOfJoin(left, rt, keys, leftTime, rightTime,
      payload :+ matchedTimeCol)
    def secs(c: Column): Column =
      c.cast("timestamp_ltz").cast("long") // floor-epoch, NTZ-safe
    val stale = col(matchedTimeCol).isNull ||
      secs(col(leftTime)) - secs(col(matchedTimeCol)) > toleranceSeconds
    // null the payload first, the matched time last: the staleness test
    // reads the matched time, so it must survive until the final column
    (payload :+ matchedTimeCol).foldLeft(joined)((d, p) =>
      d.withColumn(p, when(stale, lit(null)).otherwise(col(p))))
  }

  /** NEAREST as-of join (pandas merge_asof direction='nearest'): each
    * left row matched to the closest right row — before OR after —
    * within `toleranceSeconds`, ties to the BACKWARD match (the
    * deterministic convention; an equal-time right row IS the
    * backward match at distance 0). [[asOfJoin]] answers "the latest
    * state as of t"; this answers "the closest observation to t" —
    * sensor alignment, nearest-lab-to-event joins.
    *
    * Scale shape: the [[asOfJoin]] union trick, doubled — backward
    * LOCF and forward NOCB are two window passes over the SAME
    * (keys)-partitioned (t, tag) ordering, so Spark runs them in ONE
    * exchange + sort; no join, no range scan. Right side must be
    * unique on (keys, rightTime) ([[asOfJoin]]'s contract —
    * [[graft.ops.WindowOps.dedupKeepLast]] first).
    *
    * Determinism: distances are exact double-epoch subtractions; the
    * forward-vs-backward pick is `df < db` (tie → backward).
    *
    * @return left columns + payload of the chosen match +
    *         matched_time + direction ('backward'/'forward'/null) */
  def asOfJoinNearest(left: DataFrame, right: DataFrame,
                      keys: Seq[String], leftTime: String,
                      rightTime: String, payload: Seq[String],
                      toleranceSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(toleranceSeconds >= 0, "toleranceSeconds must be >= 0")
    require(payload.nonEmpty, "need at least one payload column")
    def secsD(c: Column): Column = c.cast("timestamp_ltz").cast("double")
    val leftCols = left.columns
    val rTagged = right.select(
      keys.map(col) :+ secsD(col(rightTime)).as("__t") :+
        lit(0).as("__tag") :+
        struct(payload.map(col) :+ col(rightTime).as("__mt"): _*)
          .as("__p"): _*)
    val lTagged = left.select(
      (keys.map(col) :+ secsD(col(leftTime)).as("__t") :+
        lit(1).as("__tag")) ++
        leftCols.filterNot(keys.contains).map(col): _*)
    val u = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val base = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__tag"))
    val wB = base.rowsBetween(Window.unboundedPreceding, 0)
    val wF = base.rowsBetween(0, Window.unboundedFollowing)
    val j = u
      .withColumn("__bp", last(col("__p"), ignoreNulls = true).over(wB))
      .withColumn("__fp", first(col("__p"), ignoreNulls = true).over(wF))
      .filter(col("__tag") === 1)
    val db = col("__t") - secsD(col("__bp.__mt"))
    val df = secsD(col("__fp.__mt")) - col("__t")
    val tol = lit(toleranceSeconds.toDouble)
    val useB = col("__bp").isNotNull && db <= tol
    val useF = col("__fp").isNotNull && df <= tol
    val chooseF = useF && (!useB || df < db)
    val chosen = when(chooseF, col("__fp")).when(useB, col("__bp"))
    j.select(leftCols.map(col) ++
      payload.map(p => chosen.getField(p).as(p)) :+
      chosen.getField("__mt").as("matched_time") :+
      when(chooseF, lit("forward")).when(useB, lit("backward"))
        .as("direction"): _*)
  }

  /** Interval (range) join: left events matched to right intervals
    * containing them — `leftTime in [startCol, endCol)` within the same
    * key. With an equi-key present this is a plain shuffle join + range
    * filter (Spark handles it); THIS helper covers the keyless/low-key
    * case by deriving a time-BIN equi-key on both sides: intervals are
    * exploded to the bins they overlap, events hash to their bin, and
    * the join runs as a bin equi-join + exact range filter — turning a
    * broadcast-nested-loop cross into a hash join whose cost tracks
    * actual overlap. `binSeconds` trades explosion factor (long
    * intervals span more bins) against bucket selectivity. */
  def rangeJoin(events: DataFrame, intervals: DataFrame, keys: Seq[String],
                eventTime: String, startCol: String, endCol: String,
                binSeconds: Long = 86400): DataFrame = {
    // NTZ timestamps refuse a direct double cast; LTZ is castable and
    // the NTZ->LTZ hop is identity under the engine's pinned UTC session
    def secs(c: Column): Column = c.cast("timestamp_ltz").cast("double")
    val evBin = events.withColumn("__bin",
      floor(secs(col(eventTime)) / binSeconds).cast("long"))
    val ivBinned = intervals.withColumn("__bin",
      explode(sequence(
        floor(secs(col(startCol)) / binSeconds).cast("long"),
        floor(secs(col(endCol)) / binSeconds).cast("long"))))
    evBin.join(ivBinned, keys :+ "__bin")
      .filter(col(eventTime) >= col(startCol) && col(eventTime) < col(endCol))
      .drop("__bin")
  }

  /** Interval-OVERLAP join: all pairs of a left and a right interval
    * on the same key whose half-open spans [ls, le) and [rs, re)
    * share a NONEMPTY intersection — max(ls, rs) < min(le, re) — the
    * interval-interval sibling of [[rangeJoin]]'s point-in-interval,
    * and the op behind "which sessions overlapped which incidents".
    * The single max<min predicate (not the textbook ls<re AND rs<le,
    * which admits a zero-length interval strictly inside another
    * span) makes zero-length intervals match nothing: an empty span
    * has no instants to share.
    *
    * No all-pairs: both sides explode to the time bins they span and
    * equi-join on (key, bin). A pair spanning several common bins
    * would match once per bin; instead of a corpus-wide DISTINCT
    * (one more shuffle over the OUTPUT), each pair is kept only in
    * its canonical bin — the bin of the overlap start max(ls, rs),
    * which provably lies in both sides' bin ranges — a narrow
    * post-join filter, so every qualifying pair appears EXACTLY once.
    *
    * Scale: explode factor is span/binSeconds + 1 per interval — set
    * binSeconds near the typical interval length so each row expands
    * to O(1) bins; the join shuffles on (key, bin), so long intervals
    * spread over many bins rather than hot-spotting one key. Column
    * names must be disjoint across sides (rename before joining). */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          keys: Seq[String], leftStart: String,
                          leftEnd: String, rightStart: String,
                          rightEnd: String,
                          binSeconds: Long = 3600): DataFrame = {
    def secs(c: Column): Column = c.cast("timestamp_ltz").cast("double")
    def bin(c: Column): Column =
      floor(secs(c) / binSeconds).cast("long")
    val l = left.withColumn("__bin",
      explode(sequence(bin(col(leftStart)), bin(col(leftEnd)))))
    val r = right.withColumn("__bin",
      explode(sequence(bin(col(rightStart)), bin(col(rightEnd)))))
    l.join(r, keys :+ "__bin")
      .filter(greatest(col(leftStart), col(rightStart)) <
        least(col(leftEnd), col(rightEnd)))
      .filter(col("__bin") ===
        bin(greatest(col(leftStart), col(rightStart))))
      .drop("__bin")
  }

  /** Grid-blocked ε-distance join (planar): every (left, right) pair
    * whose points lie within Euclidean distance `eps`, without the
    * O(n·m) cross product — the spatial-join pattern (points within
    * radius of facilities, sensor↔site matching) on the same
    * bin-then-verify plan as [[rangeJoin]]. Each side is snapped to a
    * grid of cell size `eps`: the left row stays in its own cell, the
    * right row explodes to its 3×3 neighborhood, so any pair within
    * `eps` (cell deltas necessarily in [−1,1]) meets in exactly ONE
    * cell — the left's — making the equi-join candidate set complete
    * and duplicate-free by construction; the exact predicate then
    * verifies. Returns the joined rows plus `dist2` (squared distance,
    * rounded to 6).
    *
    * Cross-engine determinism: no trig, no sqrt — the threshold
    * compares SQUARED distance, and ×/−/+ on doubles are
    * correctly-rounded IEEE ops every engine reproduces bit-for-bit
    * (a haversine variant would hang the row set on the last ulp of
    * libm's sin). Scale: shuffles on (cellx, celly) — 9× explode on
    * the right side only; skew follows spatial density, so a hot cell
    * is a genuinely dense neighborhood (salt with [[Scale.saltedJoin]]
    * if one city is half the corpus). Column names must be disjoint
    * across sides. */
  def epsilonDistanceJoin(left: DataFrame, right: DataFrame,
                          leftX: String, leftY: String,
                          rightX: String, rightY: String,
                          eps: Double): DataFrame = {
    require(eps > 0, "eps must be > 0")
    def cell(c: Column): Column = floor(c.cast("double") / eps).cast("long")
    val l = left
      .withColumn("__cx", cell(col(leftX)))
      .withColumn("__cy", cell(col(leftY)))
    val r = right
      .withColumn("__cx",
        explode(array((-1 to 1).map(d => cell(col(rightX)) + lit(d)): _*)))
      .withColumn("__cy",
        explode(array((-1 to 1).map(d => cell(col(rightY)) + lit(d)): _*)))
    val dx = col(leftX).cast("double") - col(rightX).cast("double")
    val dy = col(leftY).cast("double") - col(rightY).cast("double")
    val d2 = dx * dx + dy * dy
    l.join(r, Seq("__cx", "__cy"))
      .filter(d2 <= lit(eps * eps))
      .withColumn("dist2", round(d2, 6))
      .drop("__cx", "__cy")
  }

  /** Edit-distance similarity self-join (PassJoin segment blocking —
    * Li, Deng, Wang, Feng, ICDE'11): all unordered pairs of rows whose
    * `nameCol` values are within Levenshtein distance `k`, WITHOUT the
    * O(n²) cross product. Each string is partitioned into k+1 disjoint
    * segments; by pigeonhole, a pair within k edits shares at least one
    * segment EXACTLY, displaced by at most k positions — so candidates
    * are an equi-join of index segments against probe substrings
    * enumerated over the ±k displacement window, then verified with one
    * codegen'd `levenshtein` per distinct pair. Complete (no recall
    * loss): the completeness spec checks equality with the brute-force
    * quadratic join.
    *
    * Scale shape: both sides are narrow explodes of the input — index
    * side k+1 rows/string, probe side ≤ (k+1)(2k+1)(2k+1) substrings —
    * joined on the compact (segment#, target length, text) key, then
    * ONE distinct over candidate pairs and one levenshtein per
    * survivor; nothing is ever all-pairs.
    *
    * Corpus-constant affix stripping (round-10, closes the round-9
    * prefix-skew recall cliff): a corpus-wide shared prefix (uniform
    * "Customer#…" ID formats — common for IDs, URLs, file paths) makes
    * every segment bucket covering it dense; under `maxBucket` the one
    * discriminating bucket could exceed the cap and the join silently
    * returned ZERO pairs. Levenshtein is invariant under removing a
    * shared prefix or suffix (the standard DP trim: lev(Pa,Pb) =
    * lev(a,b) and lev(aS,bS) = lev(a,b)), so the join first strips the
    * longest prefix and suffix common to the WHOLE corpus and segments
    * only the discriminating remainder. The corpus-constant prefix is
    * computed from one cheap 5-value aggregate — the common prefix of
    * ALL strings equals the common prefix of the lexicographic min and
    * max (any x with min ≤ x ≤ max must agree with them on their shared
    * bytes); the suffix is the same trick on reversed strings, clamped
    * so prefix+suffix never exceeds the shortest string. Only those 5
    * scalars reach the driver. After stripping, segment buckets are
    * dense only where the corpus is GENUINELY near-duplicate — i.e.
    * where the output itself is quadratic. `maxBucket` still drops
    * candidate keys whose index-side bucket exceeds the cap — an
    * explicit recall concession (DISTINCT dropped-key count observable
    * as the "edit_join_dropped_keys" Observation) mirroring the LSH
    * caps.
    *
    * Strings shorter than k+1 can have every segment edited, so the
    * segment argument breaks; they're handled by a dedicated short
    * stratum — strings of length ≤ k crossed against strings of length
    * ≤ 2k (any within-k partner is that short) — bounded by the short
    * row count, which any real corpus keeps tiny.
    *
    * @return (id1, id2, dist) with id1 < id2, dist ≤ k.
    */
  def editDistanceJoin(df: DataFrame, idCol: String, nameCol: String,
                       k: Int, maxBucket: Option[Int] = None): DataFrame = {
    require(k >= 1 && k <= 4, "k must be in [1,4]")
    val kk = lit(k)
    val parts = lit(k + 1)
    val named = df.filter(col(nameCol).isNotNull)
      .select(col(idCol).as("__id"), col(nameCol).as("__s0"))
    // ---- corpus-constant affix detection: 5 scalars, one agg job ----
    val bounds = named.agg(
      min(col("__s0")), max(col("__s0")),
      min(reverse(col("__s0"))), max(reverse(col("__s0"))),
      min(length(col("__s0")))).head()
    def commonPrefixLen(a: String, b: String): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n && a.charAt(i) == b.charAt(i)) i += 1
      i
    }
    val (pre, suf) =
      if (bounds.isNullAt(0)) (0, 0) // empty input: nothing to strip
      else {
        val minLen = bounds.getInt(4)
        val p = math.min(
          commonPrefixLen(bounds.getString(0), bounds.getString(1)), minLen)
        val s = math.max(0, math.min(
          commonPrefixLen(bounds.getString(2), bounds.getString(3)),
          minLen - p))
        (p, s)
      }
    val in = named.select(col("__id"),
      col("__s0").substr(lit(pre + 1),
        length(col("__s0")) - pre - suf).as("__s"))
      .withColumn("__len", length(col("__s")))
    // ---- segment geometry for a length-L string: q = L div (k+1),
    // r = L mod (k+1); the first (k+1-r) segments have length q, the
    // last r have q+1 (the even partition the paper uses) ----
    def segLen(l: Column, i: Column): Column = {
      val q = floor(l / parts).cast("int")
      val short = parts - pmod(l, parts) // count of length-q segments
      when(i < short, q).otherwise(q + 1)
    }
    def segStart(l: Column, i: Column): Column = { // 0-based
      val q = floor(l / parts).cast("int")
      val short = parts - pmod(l, parts)
      (i * q + greatest(i - short, lit(0))).cast("int")
    }
    // ---- index side: the k+1 segments of every long-enough string ----
    val idx0 = in.filter(col("__len") >= k + 1)
      .select(col("__id"), col("__s"), col("__len"),
        explode(sequence(lit(0), kk)).as("__i"))
      .select(col("__id"), col("__s"), col("__len"), col("__i"),
        col("__s").substr(segStart(col("__len"), col("__i")) + 1,
          segLen(col("__len"), col("__i"))).as("__seg"))
      .filter(length(col("__seg")) > 0)
    val idx = maxBucket match {
      case None => idx0
      case Some(cap) =>
        val pk = Seq(col("__i"), col("__len"), col("__seg"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy(pk: _*)
        val wRn = org.apache.spark.sql.expressions.Window
          .partitionBy(pk: _*).orderBy(col("__id"))
        // both windows share the (__i,__len,__seg) hash exchange; the
        // row_number marks ONE row per bucket so the Observation counts
        // DISTINCT dropped keys, not member rows (round-10 ADVICE fix)
        val counted = idx0.withColumn("__bn", count(lit(1)).over(w))
          .withColumn("__rn", row_number().over(wRn))
        counted
          .observe("edit_join_dropped_keys",
            sum(when(col("__bn") > cap && col("__rn") === 1, 1L)
              .otherwise(0L)).as("dropped"))
          .filter(col("__bn") <= cap).drop("__bn", "__rn")
    }
    // ---- probe side: for each candidate target length L within ±k of
    // our own, the substrings that could equal segment i of a length-L
    // string under a displacement of at most k ----
    val probe = in.filter(col("__len") >= 1)
      .select(col("__id").as("__pid"), col("__s").as("__ps"),
        col("__len").as("__plen"),
        explode(sequence(lit(0), kk)).as("__i"))
      .select(col("__pid"), col("__ps"), col("__plen"), col("__i"),
        explode(sequence(col("__plen") - kk, col("__plen") + kk)).as("__L"))
      .filter(col("__L") >= k + 1)
      .withColumn("__sl", segLen(col("__L"), col("__i")))
      .filter(col("__sl") > 0)
      .withColumn("__j0",
        greatest(segStart(col("__L"), col("__i")) - kk, lit(0)))
      .withColumn("__j1",
        least(col("__plen") - col("__sl"),
          segStart(col("__L"), col("__i")) + kk))
      .filter(col("__j0") <= col("__j1"))
      .select(col("__pid"), col("__ps"), col("__plen"), col("__i"),
        col("__L"), col("__sl"),
        explode(sequence(col("__j0"), col("__j1"))).as("__j"))
      .select(col("__pid"), col("__ps"), col("__i"), col("__L"),
        col("__ps").substr(col("__j") + 1, col("__sl")).as("__sub"))
    // ---- candidates: exact segment match at the right (segment,
    // length) coordinates; normalize to unordered pairs ----
    val cand = idx.join(probe,
        idx("__i") === probe("__i") && idx("__len") === probe("__L") &&
          idx("__seg") === probe("__sub"))
      .filter(col("__id") =!= col("__pid"))
      .select(
        least(col("__id"), col("__pid")).as("id1"),
        greatest(col("__id"), col("__pid")).as("id2"),
        when(col("__id") < col("__pid"), col("__s")).otherwise(col("__ps"))
          .as("__n1"),
        when(col("__id") < col("__pid"), col("__ps")).otherwise(col("__s"))
          .as("__n2"))
      .distinct()
    // ---- short stratum: strings with every segment editable ----
    val shortL = in.filter(col("__len") <= k)
    val shortR = in.filter(col("__len") <= 2 * k)
      .select(col("__id").as("__pid"), col("__s").as("__ps"))
    val shortCand = shortL.crossJoin(shortR)
      .filter(col("__id") =!= col("__pid"))
      .select(
        least(col("__id"), col("__pid")).as("id1"),
        greatest(col("__id"), col("__pid")).as("id2"),
        when(col("__id") < col("__pid"), col("__s")).otherwise(col("__ps"))
          .as("__n1"),
        when(col("__id") < col("__pid"), col("__ps")).otherwise(col("__s"))
          .as("__n2"))
      .distinct()
    cand.union(shortCand).distinct()
      .withColumn("dist", levenshtein(col("__n1"), col("__n2")).cast("int"))
      .filter(col("dist") <= k)
      .select(col("id1"), col("id2"), col("dist"))
  }

  /** Blocked Jaro–Winkler fuzzy-match join — the classic
    * entity-resolution shape (blocking + in-block compare; Elmagarmid
    * et al., TKDE 2007 survey) for name/label vocabularies where
    * [[editDistanceJoin]]'s hard edit budget is the wrong similarity
    * (Jaro–Winkler rewards shared prefixes and tolerates
    * transpositions at any string length).
    *
    * Scale design, in order:
    *
    *   1. DISTINCT names first. Row streams repeat names massively
    *      (a 10⁹-row fact may carry 10⁵ distinct names); resolving
    *      the NAME VOCABULARY collapses the quadratic term from
    *      rows² to names² before anything else runs — the same
    *      distinct-before-expensive-op rule the reference applies to
    *      med-name regex matching (SURVEY.md §2 dedup-before-
    *      expensive-op).
    *   2. Blocking key (caller-chosen, e.g. last token, phonetic
    *      key, length band). One hash shuffle on the key; in-block
    *      all-pairs via self-equi-join, never a global cross join.
    *      Recall is exactly "pairs sharing a block" — the caller's
    *      key IS the recall contract, stated, not hidden.
    *   3. `maxBucket` caps pathological blocks (a block whose size
    *      exceeds the cap is dropped WHOLE, counted DISTINCTLY in the
    *      "fuzzy_join_dropped_blocks" Observation — the LSH-cap
    *      convention used across the dedup family).
    *   4. The comparator is the native [[graft.functions.NativeExpressions.JaroSimilarityExpr]]
    *      (one tight byte loop per pair, no per-pair allocation
    *      beyond two scratch flag arrays).
    *
    * Cost: Σ_b |b|² comparisons — Ω(output) wherever blocks are dense
    * because the names genuinely collide. Pair order is byte-
    * lexicographic (`name1 < name2`), matching DuckDB's default BINARY
    * collation so the oracle joins reproduce identical pairs.
    *
    * @return (name1, name2, jw) with name1 < name2, jw ≥ threshold
    *         rounded to 6 decimals. */
  def fuzzyMatchJoin(names: DataFrame, nameCol: String,
                     block: Column => Column, threshold: Double,
                     maxBucket: Option[Int] = None): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      "threshold must be in (0,1]")
    val vocab0 = names.filter(col(nameCol).isNotNull)
      .select(col(nameCol).as("__name")).distinct()
      .withColumn("__blk", block(col("__name")))
      .filter(col("__blk").isNotNull)
    val vocab = maxBucket match {
      case None => vocab0
      case Some(cap) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("__blk"))
        val wRn = org.apache.spark.sql.expressions.Window
          .partitionBy(col("__blk")).orderBy(col("__name"))
        val counted = vocab0.withColumn("__bn", count(lit(1)).over(w))
          .withColumn("__rn", row_number().over(wRn))
        counted
          .observe("fuzzy_join_dropped_blocks",
            sum(when(col("__bn") > cap && col("__rn") === 1, 1L)
              .otherwise(0L)).as("dropped"))
          .filter(col("__bn") <= cap).drop("__bn", "__rn")
    }
    val left = vocab.select(col("__blk"), col("__name").as("name1"))
    val right = vocab.select(col("__blk"), col("__name").as("name2"))
    left.join(right, Seq("__blk"))
      .filter(col("name1") < col("name2"))
      .withColumn("jw", round(graft.functions.NativeExpressions
        .jaro_winkler_sim(col("name1"), col("name2")), 6))
      .filter(col("jw") >= threshold)
      .select(col("name1"), col("name2"), col("jw"))
  }
}
