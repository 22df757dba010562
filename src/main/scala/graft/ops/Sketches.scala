package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic sketch operators for cardinality/frequency screening
  * at corpus scale (SURVEY.md §2.11). The reference's profiling blocks
  * count value frequencies exactly (`code/RCLIF_labs.Rmd:60-71` tallies
  * category distributions in one pass); at 100 TB an exact per-key
  * count is itself a full shuffle of the key column, so the standard
  * play is a fixed-size MERGEABLE sketch built map-side: the count-min
  * sketch (Cormode & Muthukrishnan 2005).
  *
  * Determinism contract: the hash family is the public 2-universal
  * `h_i(x) = ((a_i·x + b_i) mod p) mod w` with p = 2^31 − 1 and fixed
  * published constants — plain 64-bit integer arithmetic that any SQL
  * engine replays bit-for-bit (the a22 oracle does), unlike an
  * engine-private murmur. a_i·x stays < 2^63 for keys < 2^32.
  */
object Sketches {

  /** Prime modulus 2^31 − 1 (Mersenne) for the 2-universal family. */
  val CmsP: Long = 2147483647L

  /** Fixed per-row hash constants (classic LCG multipliers/increments —
    * arbitrary but published, so oracles can replay them). */
  val CmsA: Seq[Long] = Seq(1103515245L, 69069L, 1664525L, 22695477L)
  val CmsB: Seq[Long] = Seq(12345L, 362437L, 1013904223L, 1L)

  private def bucket(key: Column, i: Int, width: Int): Column =
    pmod(pmod(lit(CmsA(i)) * key + lit(CmsB(i)), lit(CmsP)), lit(width))

  /** Portable HyperLogLog (Flajolet et al. 2007) over an integer key
    * column — the mergeable cardinality sketch (the 100 TB answer to
    * COUNT(DISTINCT): registers from two shards union by
    * `groupBy(idx).max(rho)`), built from the repo's PORTABLE hash
    * family so a SQL engine replays every register bit-for-bit (no
    * murmur/xxhash).
    *
    * Construction (m = 64 registers): a multiply–xorshift–fold mixer
    * (two Knuth-multiplier rounds with xor-folding — an AFFINE
    * mod-prime hash leaves the low bits of consecutive keys periodic
    * and was measured collapsing 150 keys onto 9 registers; the xor
    * rounds restore avalanche) kept overflow-safe in BOTH engines
    * (every product < 2^62 — DuckDB BIGINT errors on overflow rather
    * than wrapping, so splitmix-style 64-bit wraparound is not
    * portable): a = x·2654435761; b = a xor (a≫31);
    * c = (b & (2³¹−1))·2654435761; w = c xor (c≫31). idx = w & 63;
    * rest = w ≫ 6; rho = trailing zeros of rest + 1 via the
    * isolate-lowest-bit trick bit_count((rest & −rest) − 1) + 1 —
    * pure integer ops — with rho = 57 for rest = 0. Estimate:
    * α₆₄·m²/Z where Z = Σ 2^−rho is summed as EXACT INTEGERS scaled
    * by 2^57 (a distributed double sum is order-dependent; the
    * scaled-integer sum is not), divided once; the small-range
    * linear-counting branch (E ≤ 2.5m with empty registers) uses
    * m·round(ln(m/V), 6). Measured on the 150-user fixture: 62/64
    * registers, 16% error — inside HLL's 1.04/√m ≈ 13% σ.
    *
    * Scale shape: one narrow hash projection into a 64-key hash agg —
    * map-side combine collapses the shuffle to ≤ 64·partitions rows;
    * nothing key-cardinality-sized moves.
    *
    * @return one row: (m, registers_hit, estimate, exact, rel_error)
    *         — `exact` from a real countDistinct for the audit */
  /** The HLL register columns for `key` (see [[hllDistinct]] for the
    * mixer contract): (idx in 0..63, rho in 1..57). Shared by the
    * batch sketch and the streaming per-window twin. */
  private[graft] def hllIdxRho(key: Column): (Column, Column) = {
    def shr(c: Column, n: Int): Column =
      call_function("shiftright", c, lit(n))
    val x = pmod(key.cast("long"), lit(2147483648L))
    val a = x * lit(2654435761L)
    val b = a.bitwiseXOR(shr(a, 31))
    val c = b.bitwiseAND(lit(2147483647L)) * lit(2654435761L)
    val w = c.bitwiseXOR(shr(c, 31))
    val rest = shr(w, 6)
    val tz = bit_count((rest.bitwiseAND(-rest)) - 1)
    (w.bitwiseAND(lit(63L)),
      when(rest === 0, lit(57)).otherwise(tz + 1))
  }

  /** Scaled-integer Z partial for one register (2^(57−rho), exact
    * long) — sum these per group, never doubles. */
  private[graft] def hllZTerm(rho: Column): Column =
    call_function("shiftleft", lit(1L), (lit(57) - rho).cast("int"))

  /** Estimate from (hit registers, Σ 2^(57−rho)) — α₆₄ raw branch +
    * linear counting, rounded once to 6. */
  private[graft] def hllEstimate(hit: Column, zInt: Column): Column = {
    val mD = lit(64.0)
    val z = (zInt + (lit(64L) - hit) * lit(144115188075855872L))
      .cast("double") / lit(1.44115188075855872e17)
    val eRaw = lit(0.709) * mD * mD / z
    val vEmpty = lit(64L) - hit
    round(when(eRaw <= lit(2.5) * mD && vEmpty > 0,
        mD * round(log(mD / vEmpty.cast("double")), 6))
      .otherwise(eRaw), 6)
  }

  def hllDistinct(df: DataFrame, keyCol: String): DataFrame = {
    val (idx, rho) = hllIdxRho(col(keyCol))
    val regs = df.filter(col(keyCol).isNotNull)
      .select(idx.as("__idx"), rho.as("__rho"))
      .groupBy(col("__idx")).agg(max(col("__rho")).as("__rho"))
    val agg = regs.agg(count(lit(1)).as("hit"),
      sum(hllZTerm(col("__rho"))).as("__z"))
    val exact = df.filter(col(keyCol).isNotNull)
      .agg(countDistinct(col(keyCol)).as("exact"))
    val est = hllEstimate(col("hit"), col("__z"))
    agg.crossJoin(broadcast(exact))
      .select(lit(64L).as("m"), col("hit").as("registers_hit"),
        est.as("estimate"), col("exact"),
        round(abs(est - col("exact").cast("double")) /
          col("exact").cast("double"), 6).as("rel_error"))
  }

  /** The KMV hash: the same portable multiply–xorshift–fold mixer as
    * [[hllIdxRho]], folded onto [1, 2³¹] so the k-minimum-values
    * threshold arithmetic runs in plain BIGINT in any engine. */
  private[graft] def kmvHash(key: Column): Column = {
    def shr(c: Column, n: Int): Column =
      call_function("shiftright", c, lit(n))
    val x = pmod(key.cast("long"), lit(2147483648L))
    val a = x * lit(2654435761L)
    val b = a.bitwiseXOR(shr(a, 31))
    val c = b.bitwiseAND(lit(2147483647L)) * lit(2654435761L)
    val w = c.bitwiseXOR(shr(c, 31))
    pmod(w, lit(2147483648L)) + 1L
  }

  /** K-minimum-values distinct sketch — the OTHER mergeable
    * cardinality sketch, kept beside [[hllDistinct]] for the one
    * thing HLL cannot do: SET OPERATIONS ([[kmvOverlap]] estimates
    * intersections and Jaccard from two KMV sketches; HLL registers
    * only union). The sketch is the k smallest distinct hash values;
    * with threshold h₍k₎, E = (k−1)·M/h₍k₎ (the classic KMV
    * estimator, M = 2³¹); fewer than k distinct hashes → the sketch
    * IS the distinct set and the estimate is exact-modulo-collisions
    * (the 2³¹ fold's birthday term — documented, not hidden: audit
    * columns carry the true countDistinct and relative error).
    *
    * Scale shape: narrow hash projection → distinct agg (map-side
    * combine) → `orderBy.limit(k)` which Spark executes as
    * TakeOrdered — a per-partition top-k merged on the driver, never
    * a global sort. k rows of state; mergeable by unioning sketches
    * and re-taking the k smallest.
    *
    * @return one row: (k, hashes_kept, threshold, estimate, exact,
    *         rel_error) */
  def kmvDistinct(df: DataFrame, keyCol: String,
                  k: Int = 1024): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val src = df.filter(col(keyCol).isNotNull)
    val sk = src.select(kmvHash(col(keyCol)).as("__h")).distinct()
      .orderBy(col("__h")).limit(k)
    val agg = sk.agg(count(lit(1)).as("hashes_kept"),
      max(col("__h")).as("threshold"))
    val exact = src.agg(countDistinct(col(keyCol)).as("exact"))
    agg.crossJoin(broadcast(exact))
      .select(lit(k.toLong).as("k"), col("hashes_kept"),
        col("threshold"),
        when(col("hashes_kept") < k,
            col("hashes_kept").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * lit(2147483648.0) /
            col("threshold").cast("double"), 6)).as("estimate"),
        col("exact"),
        when(col("exact") > 0,
          round(abs(when(col("hashes_kept") < k,
              col("hashes_kept").cast("double"))
            .otherwise(round(lit((k - 1).toDouble) *
              lit(2147483648.0) / col("threshold").cast("double"), 6))
            - col("exact").cast("double")) /
            col("exact").cast("double"), 6)).as("rel_error"))
  }

  /** KMV set-operation estimates for two keyed corpora — union,
    * intersection, and Jaccard from the two k-row sketches alone
    * (the reason KMV ships at all; see [[kmvDistinct]]). The union
    * sketch is the k smallest of the merged hash sets with threshold
    * τ; ρ = |common hashes ≤ τ| / |union sketch| is the Jaccard
    * estimator, and the intersection estimate is ρ·Ê(union). Every
    * estimate is a round-6 double over exact longs; the exact
    * intersection rides along as the audit column.
    *
    * Scale shape: two TakeOrdered sketches + tiny k-row joins; the
    * only corpus-sized work is the two distinct aggs and the exact
    * audit (pass `withExact = false` at true scale — the audit column
    * comes back NULL and the distinct-key join never runs).
    *
    * @param withExact compute the exact_intersection audit (a
    *        distinct-key join of the two corpora); false emits NULL
    * @return one row: (k, est_a, est_b, est_union, jaccard_est,
    *         est_intersection, exact_intersection) */
  def kmvOverlap(dfA: DataFrame, dfB: DataFrame, keyCol: String,
                 k: Int = 1024, withExact: Boolean = true): DataFrame = {
    require(k >= 2, "k must be >= 2")
    def sketch(d: DataFrame): DataFrame =
      d.filter(col(keyCol).isNotNull)
        .select(kmvHash(col(keyCol)).as("__h")).distinct()
        .orderBy(col("__h")).limit(k)
    def est(kept: Column, thr: Column): Column =
      when(kept < k, kept.cast("double"))
        .otherwise(round(lit((k - 1).toDouble) * lit(2147483648.0) /
          thr.cast("double"), 6))
    val sa = sketch(dfA).withColumnRenamed("__h", "__ha")
    val sb = sketch(dfB).withColumnRenamed("__h", "__hb")
    val su = sa.select(col("__ha").as("__h"))
      .union(sb.select(col("__hb").as("__h"))).distinct()
      .orderBy(col("__h")).limit(k)
    val aggA = sa.agg(count(lit(1)).as("__ka"), max(col("__ha")).as("__ta"))
    val aggB = sb.agg(count(lit(1)).as("__kb"), max(col("__hb")).as("__tb"))
    val aggU = su.agg(count(lit(1)).as("__ku"), max(col("__h")).as("__tu"))
    val common = sa.join(sb, col("__ha") === col("__hb"))
      .select(col("__ha").as("__h"))
      .crossJoin(broadcast(aggU))
      .filter(col("__h") <= col("__tu"))
      .agg(count(lit(1)).as("__i"))
    val exactI =
      if (withExact)
        dfA.filter(col(keyCol).isNotNull)
          .select(col(keyCol)).distinct()
          .join(dfB.filter(col(keyCol).isNotNull)
            .select(col(keyCol)).distinct(), Seq(keyCol))
          .agg(count(lit(1)).as("exact_intersection"))
      else
        dfA.sparkSession.range(1)
          .select(lit(null).cast("long").as("exact_intersection"))
    aggA.crossJoin(broadcast(aggB)).crossJoin(broadcast(aggU))
      .crossJoin(broadcast(common)).crossJoin(broadcast(exactI))
      .select(lit(k.toLong).as("k"),
        est(col("__ka"), col("__ta")).as("est_a"),
        est(col("__kb"), col("__tb")).as("est_b"),
        est(col("__ku"), col("__tu")).as("est_union"),
        when(col("__ku") > 0,
          round(col("__i").cast("double") /
            col("__ku").cast("double"), 6)).as("jaccard_est"),
        when(col("__ku") > 0,
          round(round(col("__i").cast("double") /
              col("__ku").cast("double"), 6) *
            est(col("__ku"), col("__tu")), 6)).as("est_intersection"),
        col("exact_intersection"))
  }

  /** Build a depth×width count-min sketch of a NON-NEGATIVE integer key
    * column: returns `(row, bucket, cnt)` with at most depth·width rows
    * regardless of input size. Two-phase: exact per-key partial counts
    * first (map-side combine collapses the shuffle to distinct keys),
    * then each key's count lands in `depth` cells. The sketch is
    * MERGEABLE — sketches of two corpus shards built with the same
    * (depth, width) union by `groupBy(row, bucket).sum(cnt)` — which is
    * what makes it the 100 TB profiling structure: executors emit
    * depth·width partials, never a key-cardinality shuffle. */
  def countMinSketch(df: DataFrame, keyCol: String, depth: Int = 4,
                     width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= CmsA.length,
      s"depth must be in [1, ${CmsA.length}]")
    require(width >= 2, "width must be >= 2")
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast("long").as("__k"))
      .agg(count(lit(1)).as("__c"))
    val cells = (0 until depth).map { i =>
      struct(lit(i).as("row"), bucket(col("__k"), i, width).as("bucket"))
    }
    counts
      .select(explode(array(cells: _*)).as("__cell"), col("__c"))
      .groupBy(col("__cell.row").as("row"), col("__cell.bucket").as("bucket"))
      .agg(sum(col("__c")).cast("long").as("cnt"))
  }

  /** Approximate quantiles from a fixed-width histogram sketch — the
    * second workhorse mergeable profiler next to the CM sketch: the
    * histogram (bucket → count) is shard-mergeable by bucket sum, so
    * a 100 TB percentile costs one bucket-keyed agg of bounded
    * cardinality instead of an exact-percentile sort, and the answer
    * carries its own HONEST error bound (linear interpolation inside
    * one bucket: |est − true| ≤ `width`). Deterministic end to end —
    * bucket = floor(v/width), target = p·N, the answering bucket is
    * the least with cum ≥ target, interpolation is plain double
    * arithmetic — so any SQL engine replays it exactly, unlike a
    * t-digest whose centroids depend on merge order.
    *
    * @return one row per requested quantile: (p, est, err_bound). */
  def histQuantile(df: DataFrame, valCol: String, width: Double,
                   probs: Seq[Double]): DataFrame = {
    require(width > 0, "width must be > 0")
    require(probs.nonEmpty && probs.forall(p => p > 0 && p < 1),
      "probs must be in (0,1)")
    val v = col(valCol).cast("double")
    val hist = df.filter(v.isNotNull)
      .groupBy(floor(v / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("cum_prev", col("cum") - col("cnt"))
    val tot = hist.agg(sum(col("cnt")).cast("long").as("__n"))
    val ps = probs.map(p => struct(lit(p).as("p")))
    cum.crossJoin(broadcast(tot))
      .select(col("bucket"), col("cnt"), col("cum"), col("cum_prev"),
        col("__n"), explode(array(ps: _*)).as("__p"))
      .filter(col("cum").cast("double") >= col("__p.p") * col("__n"))
      .groupBy(col("__p.p").as("p"))
      .agg(min(struct(col("bucket"), col("cum_prev"), col("cnt"),
        col("__n"))).as("__b"))
      .select(col("p"),
        round(col("__b.bucket") * lit(width) + lit(width) *
          (col("p") * col("__b.__n") -
            col("__b.cum_prev").cast("double")) / col("__b.cnt"), 6)
          .as("est"),
        lit(width).as("err_bound"))
  }

  /** Point-estimate every distinct key of `df` against its own sketch
    * and report the top `k` keys by estimate alongside their exact
    * counts — the heavy-hitter screen with its own error audit
    * (`overcount = est − exact` ≥ 0 always; ≤ 2·N/width with prob
    * 1 − 2^−depth per the CM bound). The sketch (≤ depth·width rows)
    * broadcasts into the estimation join, so the whole query costs one
    * key shuffle + a broadcast probe + a TakeOrdered — no second wide
    * exchange. Ordering tiebreak on the key keeps the top-k row set
    * deterministic under estimate ties. */
  def countMinTopK(df: DataFrame, keyCol: String, k: Int = 20,
                   depth: Int = 4, width: Int = 1024): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val sketch = countMinSketch(df, keyCol, depth, width)
    val exact = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast("long").as("__k"))
      .agg(count(lit(1)).as("exact"))
    val cells = (0 until depth).map { i =>
      struct(lit(i).as("row"), bucket(col("__k"), i, width).as("bucket"))
    }
    exact
      .select(col("__k"), col("exact"),
        explode(array(cells: _*)).as("__cell"))
      .join(broadcast(sketch),
        col("__cell.row") === sketch("row") &&
          col("__cell.bucket") === sketch("bucket"))
      .groupBy(col("__k"))
      .agg(min(col("cnt")).as("cms_est"), max(col("exact")).as("exact"))
      .select(col("__k").as(keyCol), col("cms_est"), col("exact"),
        (col("cms_est") - col("exact")).as("overcount"))
      .orderBy(col("cms_est").desc, col(keyCol))
      .limit(k)
  }
}
