package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window / grouped-sequence operators (SURVEY.md §2.5 W1–W3, §2.4 A4).
  *
  * All partition by the entity key (encounter/patient/user) — the same key
  * every join in the workload uses, so at scale a single upstream
  * repartition+sortWithinPartitions by that key serves every window here
  * with one shuffle, and AQE coalesces the post-shuffle partitions.
  */
object WindowOps {

  /** W1: tidyr `fill(.direction = "downup")` — last observation carried
    * forward, then leading nulls backfilled from the first later value.
    * (`code/RCLIF_vitals.Rmd:161-162`.) Two frame passes over ONE window
    * partitioning (one shuffle, one sort; Spark reuses the sorted child
    * for both frames).
    */
  def fillDownUp(df: DataFrame, partitionBy: Seq[String],
                 orderBy: Seq[Column], cols: Seq[String]): DataFrame = {
    val base = Window.partitionBy(partitionBy.map(col): _*).orderBy(orderBy: _*)
    val down = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val up   = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c, coalesce(
        last(col(c), ignoreNulls = true).over(down),
        first(col(c), ignoreNulls = true).over(up)))
    }
  }

  /** W1 down-only variant (plain LOCF). */
  def fillDown(df: DataFrame, partitionBy: Seq[String],
               orderBy: Seq[Column], cols: Seq[String]): DataFrame = {
    val down = Window.partitionBy(partitionBy.map(col): _*)
      .orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(down))
    }
  }

  /** W2: episode derivation — stop_time of each event is the next event's
    * time within the entity (`code/RCLIF_dialysis.Rmd:90-99`). NULL stop on
    * the last event per entity is the pinned semantics (SURVEY.md §7.8).
    */
  def leadEpisodes(df: DataFrame, partitionBy: Seq[String], timeCol: String,
                   stopCol: String, tiebreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(partitionBy.map(col): _*)
      .orderBy(col(timeCol) +: tiebreak: _*)
    df.withColumn(stopCol, lead(col(timeCol), 1).over(w))
  }

  /** A4: dedup by key keeping the LAST row in `orderBy` order
    * (`code/RCLIF_disposition.Rmd:50-51`). R relies on a prior arrange();
    * distributed execution has no carried order, so the order — including
    * a deterministic tiebreak — must be explicit (SURVEY.md §7.2).
    */
  def dedupKeepLast(df: DataFrame, keys: Seq[String],
                    orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy.map(_.desc): _*)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** Regular-time-grid resampling with last-observation-carried-forward
    * — the "blocked dataset" op: per key, emit one row per `stepSeconds`
    * from the step-aligned first observation (date_trunc on
    * `alignUnit`, so grids are phase-stable across keys) to the last,
    * carrying the latest payload at-or-before each grid instant (null
    * before the first observation). Composition, not a new engine
    * primitive: a bounded per-key grid explode (duration/step rows —
    * no row-per-second blowups) feeding [[graft.ops.Joins.asOfJoin]]'s
    * single-exchange union+LOCF. Right side must be unique on
    * (keys, tsCol) — [[dedupKeepLast]] first — per asOfJoin's
    * determinism contract. */
  def resampleLocf(df: DataFrame, keys: Seq[String], tsCol: String,
                   payload: Seq[String], stepSeconds: Long,
                   alignUnit: String = "hour"): DataFrame = {
    require(stepSeconds > 0, "stepSeconds must be positive")
    val grid = df.groupBy(keys.map(col): _*)
      .agg(date_trunc(alignUnit, min(col(tsCol))).as("__g0"),
        max(col(tsCol)).as("__t1"))
      .select(keys.map(col) :+
        explode(expr(s"sequence(__g0, __t1, interval $stepSeconds second)"))
          .as("grid_ts"): _*)
    Joins.asOfJoin(grid, df, keys, "grid_ts", tsCol, payload)
  }

  /** Time-grid resampling with LINEAR INTERPOLATION — the smooth twin
    * of [[resampleLocf]]: each grid instant takes
    * prev + (next − prev)·(g − t_prev)/(t_next − t_prev) between its
    * bracketing observations. Convention at the edges: before the
    * first observation → null (there is nothing to interpolate FROM),
    * after the last → LOCF (the step-function tail every monitoring
    * chart draws); a grid instant that HITS an observation returns it
    * exactly (the zero-span guard also kills the 0/0 there).
    *
    * The forward neighbor costs NO new machinery: it is [[graft.ops.Joins.asOfJoin]]
    * run on the NEGATED µs axis (last-before on −t = first-after on
    * t), so both directions reuse the proven single-exchange
    * union+LOCF plan — two key exchanges total, no per-grid-row probe
    * join. Fraction arithmetic runs on exact µs longs cast to double
    * (integer-valued, engine-identical), result on the round-6
    * grid. */
  def resampleInterp(df: DataFrame, keys: Seq[String], tsCol: String,
                     valueCol: String, stepSeconds: Long,
                     alignUnit: String = "hour"): DataFrame = {
    require(stepSeconds > 0, "stepSeconds must be positive")
    def us(c: Column): Column = unix_micros(c.cast("timestamp_ltz"))
    val grid = df.groupBy(keys.map(col): _*)
      .agg(date_trunc(alignUnit, min(col(tsCol))).as("__g0"),
        max(col(tsCol)).as("__t1"))
      .select(keys.map(col) :+
        explode(expr(s"sequence(__g0, __t1, interval $stepSeconds second)"))
          .as("grid_ts"): _*)
    val obs = df.select(keys.map(col) :+ col(tsCol) :+
      col(valueCol).as("__v") :+ us(col(tsCol)).as("__obs_us"): _*)
    val back = Joins.asOfJoin(grid, obs, keys, "grid_ts", tsCol,
        Seq("__v", "__obs_us"))
      .withColumnRenamed("__v", "__pv")
      .withColumnRenamed("__obs_us", "__pt")
    val gNeg = back.withColumn("__gneg", -us(col("grid_ts")))
    val obsNeg = obs.withColumn("__tneg", -col("__obs_us"))
    val both = Joins.asOfJoin(gNeg, obsNeg, keys, "__gneg", "__tneg",
        Seq("__v", "__obs_us"))
      .withColumnRenamed("__v", "__nv")
      .withColumnRenamed("__obs_us", "__nt")
    val g = us(col("grid_ts")).cast("double")
    val tp = col("__pt").cast("double")
    val tn = col("__nt").cast("double")
    val frac = (g - tp) / (tn - tp)
    val interp =
      when(col("__pt").isNull, lit(null).cast("double"))
        .when(col("__nt").isNull || col("__nt") === col("__pt"),
          col("__pv").cast("double"))
        .otherwise(round(col("__pv").cast("double") +
          (col("__nv").cast("double") - col("__pv").cast("double")) *
            frac, 6))
    both.select(keys.map(col) :+ col("grid_ts") :+
      interp.as("interp_value"): _*)
  }

  /** Rolling features for the "blocked dataset": per key, the mean of
    * `valueCol` over (a) the trailing `nRows`-row frame in
    * (`tsCol`, tiebreak) order and (b) the trailing `rangeSeconds`
    * time frame (set-valued over epoch seconds, so simultaneous events
    * are tie-insensitive). Both frames share ONE partitioning — a
    * single shuffle on the key serves both (Spark reuses the sorted
    * child across same-partitioning windows). Means accumulate in
    * exact decimal then divide once as double, so neither parallel
    * reduction order nor engine can perturb the result. Nulls are
    * excluded frame-wise (sum and count both skip them); an all-null
    * frame yields null. */
  def rollingMeans(df: DataFrame, keys: Seq[String], tsCol: String,
                   tiebreak: Seq[Column], valueCol: String,
                   nRows: Int, rangeSeconds: Long): DataFrame = {
    require(nRows >= 1, "nRows must be >= 1")
    require(rangeSeconds >= 0, "rangeSeconds must be >= 0")
    val v = col(valueCol)
    val byRows = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol) +: tiebreak: _*)
      .rowsBetween(-(nRows - 1).toLong, Window.currentRow)
    // floor-to-second epoch ordering: Spark's timestamp->long cast
    // truncates; the oracle must floor too (DuckDB epoch() keeps the
    // fraction and a bare BIGINT cast would round instead). The NTZ->
    // LTZ hop first: NTZ refuses a direct numeric cast, and under the
    // engine's pinned UTC session the hop is identity (see rangeJoin).
    val byRange = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).cast("timestamp_ltz").cast("long"))
      .rangeBetween(-rangeSeconds, Window.currentRow)
    def mean(w: org.apache.spark.sql.expressions.WindowSpec): Column =
      sum(v.cast("decimal(30,6)")).over(w).cast("double") / count(v).over(w)
    df.withColumn("roll_rows_avg", round(mean(byRows), 6))
      .withColumn("roll_time_avg", round(mean(byRange), 6))
  }

  /** Time-weighted average per key: each observation carries its value
    * until the NEXT observation (LOCF step function), so
    * TWA = Σ value_i · (t_{i+1} − t_i) / (t_last − t_first) — the
    * clinically correct mean for irregularly sampled series (a plain
    * mean over-weights densely sampled episodes; the reference's
    * vitals arrive exactly this way). The last observation of a key
    * has no duration and contributes no weight; null observations
    * likewise (their interval's value is undefined, not carried —
    * callers wanting carry-over apply [[fillDown]] first); keys whose
    * time span is zero — or with NO weighted observation at all (every
    * non-final value null) — report null (SUM over nothing is null in
    * both engines; a 0.0 would fabricate a measurement).
    * value·duration accumulates in exact decimal, divided once —
    * reduction-order-free. One shuffle on the key (lead window + agg
    * share it). */
  def timeWeightedAvg(df: DataFrame, keys: Seq[String], tsCol: String,
                      tiebreak: Seq[Column], valueCol: String,
                      outCol: String = "twa"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol) +: tiebreak: _*)
    // floor-epoch on the cross-engine grid; NTZ->LTZ hop is identity
    // under the pinned UTC session and NTZ refuses a direct long cast
    val t = col(tsCol).cast("timestamp_ltz").cast("long")
    val weighted = df
      .withColumn("__nxt", lead(t, 1).over(w))
      .withColumn("__t", t)
    val span = max(col("__t")) - min(col("__t"))
    weighted.groupBy(keys.map(col): _*)
      .agg(
        when(span > 0, round(
          sum(col(valueCol).cast("decimal(20,6)") *
            (col("__nxt") - col("__t"))).cast("double") / span, 6))
          .otherwise(lit(null)).as(outCol),
        span.cast("long").as("span_seconds"),
        count(lit(1)).as("n_events"))
  }

  /** Keep-first twin of [[dedupKeepLast]]. */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String],
                     orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** Sessionization: assign a session id that increments whenever the gap
    * to the previous event exceeds `gapSeconds`. Generalizes the dialysis
    * episode construction; one shuffle on the entity key.
    */
  def sessionize(df: DataFrame, partitionBy: Seq[String], timeCol: String,
                 gapSeconds: Long, sessionCol: String = "session_id",
                 tiebreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(partitionBy.map(col): _*)
      .orderBy(col(timeCol) +: tiebreak: _*)
    // Fractional-second gaps: cast-to-double keeps sub-second precision
    // (unix_timestamp truncates to whole seconds, which splits sessions
    // differently from engines computing fractional epochs when a gap
    // straddles exactly gapSeconds). NTZ->LTZ hop first: NTZ refuses a
    // direct numeric cast; identity under the pinned UTC session.
    def secs(c: Column): Column = c.cast("timestamp_ltz").cast("double")
    val gap = secs(col(timeCol)) - secs(lag(col(timeCol), 1).over(w))
    df.withColumn("__graft_new", when(gap.isNull || gap > gapSeconds, 1L).otherwise(0L))
      .withColumn(sessionCol,
        sum(col("__graft_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__graft_new")
  }

  /** Interval UNION (flatten) — merge each key's overlapping or
    * touching [start, end] intervals into maximal disjoint episodes:
    * the complement of [[sessionize]] (gap between POINT events)
    * for data that arrives as genuine intervals — medication
    * administrations, device sessions, ICU stays (the reference's
    * dialysis episodes are exactly this shape when windows overlap).
    * Touching intervals (next.start == current max end) MERGE
    * (closed-interval semantics, stated contract).
    *
    * Plan: one key-hash exchange; per key, intervals sort by
    * (start, end) and a new episode opens exactly when start exceeds
    * the running max of PRECEDING ends (a prefix-max window — the
    * watertight form; comparing against lag(end) alone is the classic
    * bug that splits an episode when an early long interval swallows
    * later short ones). Episode id = prefix sum of the new-episode
    * flags; one agg to the episode frame. All comparisons on exact
    * integer micros.
    *
    * @return (keys…, episode, episode_start, episode_end,
    *         n_intervals) — micros columns */
  def intervalUnion(df: DataFrame, keys: Seq[String], startCol: String,
                    endCol: String): DataFrame = {
    val us = (c: Column) => unix_micros(c.cast("timestamp_ltz"))
    val src = df.filter(col(startCol).isNotNull && col(endCol).isNotNull)
      .select(keys.map(col) :+ us(col(startCol)).as("__s") :+
        us(col(endCol)).as("__e"): _*)
      .filter(col("__e") >= col("__s"))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__s"), col("__e"))
    val prevMaxEnd = max(col("__e"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = src
      .withColumn("__new",
        when(prevMaxEnd.isNull || col("__s") > prevMaxEnd, 1L)
          .otherwise(0L))
      .withColumn("__ep",
        sum(col("__new")).over(w.rowsBetween(
          Window.unboundedPreceding, 0)))
    flagged.groupBy(keys.map(col) :+ col("__ep").as("episode"): _*)
      .agg(min(col("__s")).as("episode_start"),
        max(col("__e")).as("episode_end"),
        count(lit(1)).as("n_intervals"))
  }

  /** EWMA (exponential smoothing) over each key's time-ordered values:
    * s₁ = v₁, sᵢ = α·vᵢ + (1−α)·sᵢ₋₁. The recurrence runs in EXACT
    * DECIMAL arithmetic (inputs rounded once to 6 on the double — the
    * established convention — then decimal(18,6) state, decimal α/1−α
    * factors, one half-up round per step): a double recurrence
    * compounds thousands of round(double, 6) calls per key and WILL
    * eventually hit a shortest-repr-vs-binary half-way case where
    * engines disagree by 1 ulp (measured at sf0.01, step ~1199);
    * decimal steps are engine-free, and the oracle's recursive CTE
    * replays them exactly. Returns (key…, idCol, ewma double) — the
    * smoothing the reference's LOCF fill family lacks, and the one
    * per-key recurrence NO window function expresses (window frames
    * aggregate a range, they can't carry state).
    *
    * Scale shape: ONE key-hash exchange — per key a sorted
    * `collect_list` + one codegen'd `aggregate` HOF fold emitting the
    * running smooth per element. The per-key ARRAY is the documented
    * bound (the funnel convention): `maxEventsPerKey` caps it at the
    * first N events by time with the dropped-row count observable as
    * the "ewma_dropped_events" Observation; default None is exact. */
  def ewma(df: DataFrame, keys: Seq[String], tsCol: String, idCol: String,
           valCol: String, alpha: Double = 0.3,
           maxEventsPerKey: Option[Int] = None): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha in (0,1)")
    require(maxEventsPerKey.forall(_ > 0), "maxEventsPerKey must be > 0")
    val kcols = keys.map(col)
    val bounded = maxEventsPerKey match {
      case None => df
      case Some(cap) =>
        val w = Window.partitionBy(kcols: _*)
          .orderBy(col(tsCol), col(idCol))
        df.withColumn("__rn", row_number().over(w))
          .observe("ewma_dropped_events",
            sum(when(col("__rn") > cap, 1L).otherwise(0L)).as("dropped"))
          .filter(col("__rn") <= cap).drop("__rn")
    }
    // α and 1−α as EXACT decimals (1−α computed in BigDecimal, not
    // double subtraction) so each step is pure decimal arithmetic
    val aBD = new java.math.BigDecimal(alpha.toString)
    val bBD = java.math.BigDecimal.ONE.subtract(aBD)
    val a = s"cast(${aBD.toPlainString} as decimal(10,8))"
    val b = s"cast(${bBD.toPlainString} as decimal(10,8))"
    def step = s"""cast(round($a * e.v + $b * acc.last, 6)
                  |      as decimal(18,6))""".stripMargin
    bounded
      .select(kcols :+ struct(
        col(tsCol).cast("timestamp_ltz").cast("double").as("t"),
        col(idCol).cast("long").as("id"),
        round(col(valCol).cast("double"), 6).cast("decimal(18,6)")
          .as("v")).as("__e"): _*)
      .groupBy(kcols: _*)
      .agg(sort_array(collect_list(col("__e"))).as("__evs"))
      .select(kcols :+ expr(
        s"""aggregate(__evs,
           |  struct(cast(array() as
           |           array<struct<id:bigint, s:decimal(18,6)>>) AS out,
           |         cast(null as decimal(18,6)) AS last),
           |  (acc, e) -> struct(
           |    concat(acc.out, array(named_struct('id', e.id, 's',
           |      CASE WHEN acc.last IS NULL THEN e.v
           |           ELSE $step END))),
           |    CASE WHEN acc.last IS NULL THEN e.v ELSE $step END),
           |  acc -> acc.out)""".stripMargin).as("__arr"): _*)
      .select(kcols :+ explode(col("__arr")).as("__o"): _*)
      .select(kcols :+ col("__o.id").as(idCol) :+
        col("__o.s").cast("double").as("ewma"): _*)
  }

  /** One-sided upper CUSUM change detection (Page 1954) per key:
    * s_i = max(0, s_{i−1} + (x_i − target − slack)), alarm when
    * s_i > threshold — the sequential drift detector that flags a
    * sustained upward shift long before any fixed-window mean moves.
    * Like [[ewma]], a per-key ordered RECURRENCE no window frame
    * expresses: one key exchange, sorted collect_list + codegen'd HOF
    * fold. Every step is EXACT decimal arithmetic (inputs rounded
    * once to scale 6; target/slack exact decimal literals; max is
    * exact), so a recursive CTE replays the run bit-for-bit and the
    * alarm set is engine-identical. Same bot-user cap convention as
    * the funnel (`maxEventsPerKey` + Observation). */
  def cusum(df: DataFrame, keys: Seq[String], tsCol: String,
            idCol: String, valCol: String, target: Double,
            slack: Double, threshold: Double,
            maxEventsPerKey: Option[Int] = None): DataFrame = {
    require(threshold > 0, "threshold must be > 0")
    require(maxEventsPerKey.forall(_ > 0), "maxEventsPerKey must be > 0")
    val kcols = keys.map(col)
    val bounded = maxEventsPerKey match {
      case None => df
      case Some(cap) =>
        val w = Window.partitionBy(kcols: _*)
          .orderBy(col(tsCol), col(idCol))
        df.withColumn("__rn", row_number().over(w))
          .observe("cusum_dropped_events",
            sum(when(col("__rn") > cap, 1L).otherwise(0L)).as("dropped"))
          .filter(col("__rn") <= cap).drop("__rn")
    }
    val driftBD = new java.math.BigDecimal(target.toString)
      .add(new java.math.BigDecimal(slack.toString))
    val drift = s"cast(${driftBD.toPlainString} as decimal(18,6))"
    val hBD = new java.math.BigDecimal(threshold.toString)
    val h = s"cast(${hBD.toPlainString} as decimal(18,6))"
    def step = s"""cast(greatest(cast(0 as decimal(18,6)),
                  |  acc.last + e.v - $drift) as decimal(18,6))""".stripMargin
    bounded
      .select(kcols :+ struct(
        col(tsCol).cast("timestamp_ltz").cast("double").as("t"),
        col(idCol).cast("long").as("id"),
        round(col(valCol).cast("double"), 6).cast("decimal(18,6)")
          .as("v")).as("__e"): _*)
      .groupBy(kcols: _*)
      .agg(sort_array(collect_list(col("__e"))).as("__evs"))
      .select(kcols :+ expr(
        s"""aggregate(__evs,
           |  struct(cast(array() as
           |           array<struct<id:bigint, s:decimal(18,6)>>) AS out,
           |         cast(0 as decimal(18,6)) AS last),
           |  (acc, e) -> struct(
           |    concat(acc.out, array(named_struct('id', e.id, 's', $step))),
           |    $step),
           |  acc -> acc.out)""".stripMargin).as("__arr"): _*)
      .select(kcols :+ explode(col("__arr")).as("__o"): _*)
      .select(kcols :+ col("__o.id").as(idCol) :+
        col("__o.s").cast("double").as("cusum") :+
        expr(s"__o.s > $h").as("alarm"): _*)
  }

  /** Per-key token-bucket rate limiting, replayed deterministically
    * over history: each key's bucket holds `capacity` tokens, refills
    * at `refillPerSec`, and every event either ADMITS (tokens ≥ 1,
    * bucket debited) or is flagged for drop — the admission-control
    * audit ("which requests would a limiter of this shape have
    * shed?") run as a batch query, and the semantics contract for
    * [[graft.streaming.EventStreams.rateLimitStream]], its online
    * twin. Like [[ewma]]/[[cusum]], a per-key ordered RECURRENCE no
    * window frame expresses: one key exchange, sorted collect_list +
    * codegen'd HOF fold.
    *
    * Exact arithmetic: the refill is (Δt µs)·ratePerµs with the rate
    * as an exact decimal literal, rounded once per step to scale 6 —
    * a recursive CTE replays the run bit-for-bit, and the streaming
    * twin's chunked replay is bit-equal. The bucket starts FULL
    * (first event always admits, capacity ≥ 1). Same bot-user cap
    * convention as the funnel (`maxEventsPerKey` + Observation).
    *
    * @return (keys..., idCol, tokens, admitted) — tokens AFTER the
    *         event's debit. */
  def rateLimit(df: DataFrame, keys: Seq[String], tsCol: String,
                idCol: String, capacity: Int, refillPerSec: Double,
                maxEventsPerKey: Option[Int] = None): DataFrame = {
    require(capacity >= 1, "capacity must be >= 1")
    require(refillPerSec > 0, "refillPerSec must be > 0")
    require(maxEventsPerKey.forall(_ > 0), "maxEventsPerKey must be > 0")
    val kcols = keys.map(col)
    val bounded = maxEventsPerKey match {
      case None => df
      case Some(cap) =>
        val w = Window.partitionBy(kcols: _*)
          .orderBy(col(tsCol), col(idCol))
        df.withColumn("__rn", row_number().over(w))
          .observe("rate_limit_dropped_events",
            sum(when(col("__rn") > cap, 1L).otherwise(0L)).as("dropped"))
          .filter(col("__rn") <= cap).drop("__rn")
    }
    val rBD = new java.math.BigDecimal(refillPerSec.toString)
      .movePointLeft(6) // tokens per MICROSECOND, exact
    // precision scale+4 (rates to 9999/s): keeps the (µs·rate) product
    // inside BOTH engines' exact-decimal width so neither truncates
    val rate =
      s"cast(${rBD.toPlainString} as decimal(${rBD.scale + 4},${rBD.scale}))"
    val cap = s"cast($capacity as decimal(18,6))"
    val one = "cast(1 as decimal(18,6))"
    // refill 0 on the first event, where the bucket initializes FULL
    def refill = s"""CASE WHEN acc.lt IS NULL
                    |     THEN cast(0 as decimal(18,6))
                    |     ELSE cast(round((e.t - acc.lt) * $rate, 6)
                    |               as decimal(18,6)) END""".stripMargin
    def avail = s"least($cap, acc.tok + $refill)"
    def newTok = s"""cast(CASE WHEN $avail >= $one THEN $avail - $one
                    |          ELSE $avail END as decimal(18,6))""".stripMargin
    bounded
      .select(kcols :+ struct(
        expr(s"unix_micros(cast($tsCol as timestamp_ltz))").as("t"),
        col(idCol).cast("long").as("id")).as("__e"): _*)
      .groupBy(kcols: _*)
      .agg(sort_array(collect_list(col("__e"))).as("__evs"))
      .select(kcols :+ expr(
        s"""aggregate(__evs,
           |  struct(cast(array() as array<struct<id:bigint,
           |           tok:decimal(18,6), adm:boolean>>) AS out,
           |         $cap AS tok, cast(null as bigint) AS lt),
           |  (acc, e) -> struct(
           |    concat(acc.out, array(named_struct('id', e.id,
           |      'tok', $newTok, 'adm', $avail >= $one))),
           |    $newTok,
           |    e.t),
           |  acc -> acc.out)""".stripMargin).as("__arr"): _*)
      .select(kcols :+ explode(col("__arr")).as("__o"): _*)
      .select(kcols :+ col("__o.id").as(idCol) :+
        col("__o.tok").cast("double").as("tokens") :+
        col("__o.adm").as("admitted"): _*)
  }

  /** Rolling z-score anomaly detection per key: each event scored
    * against the mean/std of its own TRAILING `lookback` values
    * (frame excludes the current row — the score must not see the
    * point it judges), flagged when |z| > `zThreshold`. The
    * streaming-adjacent anomaly screen next to [[cusum]] (CUSUM finds
    * sustained drift; this finds single spikes against local
    * context) and the per-key complement of Quality.robustOutliers'
    * corpus-global MAD fences.
    *
    * One exchange: count, Σv and Σv² share a single (key,
    * ts-ordered) window frame. Determinism: v rounded once to
    * decimal(18,6); both running sums are exact decimal; mean and
    * E[v²] are double divisions rounded to 6; variance =
    * max(0, E[v²] − mean²) rounded to 6 (the clamp kills the −1e−12
    * FP residue identically in both engines); std = sqrt (IEEE
    * correctly rounded); z rounded to 6, null when std = 0 or the
    * frame holds fewer than `minObs` points. */
  def rollingZscore(df: DataFrame, keys: Seq[String], tsCol: String,
                    idCol: String, valCol: String, lookback: Int = 10,
                    zThreshold: Double = 3.0, minObs: Int = 4)
      : DataFrame = {
    require(lookback >= 2 && minObs >= 2 && minObs <= lookback,
      "need 2 <= minObs <= lookback")
    require(zThreshold > 0, "zThreshold must be > 0")
    val kcols = keys.map(col)
    def dec(c: Column): Column = c.cast("decimal(18,6)")
    val w = Window.partitionBy(kcols: _*)
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(-lookback, -1)
    val v = dec(round(col(valCol).cast("double"), 6))
    val n = count(v).over(w)
    val s1 = sum(v).over(w)
    val s2 = sum(dec(round(v * v, 6))).over(w)
    val mean = round(s1.cast("double") / n, 6)
    val ev2 = round(s2.cast("double") / n, 6)
    val variance = round(greatest(lit(0.0), ev2 - mean * mean), 6)
    val std = sqrt(variance)
    val z = when(n >= minObs && std > 0,
      round((v.cast("double") - mean) / std, 6))
    df.select(kcols ++ Seq(col(idCol), col(valCol),
      n.cast("long").as("n_window"),
      when(n >= minObs, mean).as("roll_mean"),
      when(n >= minObs, round(std, 6)).as("roll_std"),
      z.as("zscore"),
      coalesce(abs(z) > lit(zThreshold), lit(false)).as("anomaly")): _*)
  }

  /** Holt's linear-trend (double exponential) smoothing per key — the
    * forecasting recurrence one rung above [[ewma]]: a level AND a
    * trend are carried, l = α·x + (1−α)·(l₀+b₀), b = β·(l−l₀) +
    * (1−β)·b₀, with the one-step-ahead forecast l+b per event — what
    * an operations dashboard plots as "expected next value" per
    * series. Initialization: l₁ = x₁, b₁ = 0.
    *
    * Same chassis and contracts as [[ewma]]/[[cusum]]/[[rateLimit]]:
    * one key exchange, sorted HOF fold, every coefficient an exact
    * decimal literal, every assignment rounded once to scale 6 — the
    * recursive-CTE replay is bit-exact. Two carried values means the
    * new level is inlined into the trend step (cheap arithmetic, the
    * documented HOF re-evaluation trade).
    *
    * @return (keys..., idCol, level, trend, forecast) */
  def holt(df: DataFrame, keys: Seq[String], tsCol: String,
           idCol: String, valCol: String, alpha: Double, beta: Double,
           maxEventsPerKey: Option[Int] = None): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha in (0,1)")
    require(beta > 0 && beta < 1, "beta in (0,1)")
    require(maxEventsPerKey.forall(_ > 0), "maxEventsPerKey must be > 0")
    val kcols = keys.map(col)
    val bounded = maxEventsPerKey match {
      case None => df
      case Some(cap) =>
        val w = Window.partitionBy(kcols: _*)
          .orderBy(col(tsCol), col(idCol))
        df.withColumn("__rn", row_number().over(w))
          .observe("holt_dropped_events",
            sum(when(col("__rn") > cap, 1L).otherwise(0L)).as("dropped"))
          .filter(col("__rn") <= cap).drop("__rn")
    }
    def decLit(d: Double): String = {
      val bd = new java.math.BigDecimal(d.toString)
      s"cast(${bd.toPlainString} as decimal(10,8))"
    }
    def oneMinus(d: Double): String = {
      val bd = java.math.BigDecimal.ONE
        .subtract(new java.math.BigDecimal(d.toString))
      s"cast(${bd.toPlainString} as decimal(10,8))"
    }
    val (a, ia) = (decLit(alpha), oneMinus(alpha))
    val (b, ib) = (decLit(beta), oneMinus(beta))
    def newL = s"""CASE WHEN acc.l IS NULL THEN e.v
                  |     ELSE cast(round($a * e.v + $ia * (acc.l + acc.b), 6)
                  |               as decimal(18,6)) END""".stripMargin
    def newB = s"""CASE WHEN acc.l IS NULL THEN cast(0 as decimal(18,6))
                  |     ELSE cast(round($b * (($newL) - acc.l)
                  |                    + $ib * acc.b, 6)
                  |               as decimal(18,6)) END""".stripMargin
    bounded
      .select(kcols :+ struct(
        col(tsCol).cast("timestamp_ltz").cast("double").as("t"),
        col(idCol).cast("long").as("id"),
        round(col(valCol).cast("double"), 6).cast("decimal(18,6)")
          .as("v")).as("__e"): _*)
      .groupBy(kcols: _*)
      .agg(sort_array(collect_list(col("__e"))).as("__evs"))
      .select(kcols :+ expr(
        s"""aggregate(__evs,
           |  struct(cast(array() as array<struct<id:bigint,
           |           l:decimal(18,6), b:decimal(18,6)>>) AS out,
           |         cast(null as decimal(18,6)) AS l,
           |         cast(null as decimal(18,6)) AS b),
           |  (acc, e) -> struct(
           |    concat(acc.out, array(named_struct('id', e.id,
           |      'l', $newL, 'b', $newB))),
           |    $newL, $newB),
           |  acc -> acc.out)""".stripMargin).as("__arr"): _*)
      .select(kcols :+ explode(col("__arr")).as("__o"): _*)
      .select(kcols :+ col("__o.id").as(idCol) :+
        col("__o.l").cast("double").as("level") :+
        col("__o.b").cast("double").as("trend") :+
        (col("__o.l") + col("__o.b")).cast("double").as("forecast"): _*)
  }

  /** Single best changepoint per key (one step of binary
    * segmentation, the classic offline changepoint family — CUSUM's
    * retrospective sibling): the split s minimizing
    * SSE(1..s) + SSE(s+1..n), i.e. the two-segment least-squares fit,
    * with gain = SSE(1..n) − cost(s). SSE comes from prefix sums
    * (Σv, Σv²) so the whole search is ONE pass: no per-split
    * re-aggregation, no quadratic anything.
    *
    * Scale shape: one key exchange carries the ordered prefix sums
    * (two running decimals), the per-row cost is a narrow projection,
    * and the per-key argmin is a rank over the same exchange. Cost
    * O(n) per key.
    *
    * Determinism: values round once to 6 (decimal prefix sums exact);
    * the cost formula is fixed-order double arithmetic rounded once
    * to 6; argmin ties break on the EARLIER split. Minimum segment
    * length `minSeg` on both sides; keys with fewer than 2·minSeg
    * points yield no row.
    *
    * @return one row per key: (keys…, split_idx — 1-based last index
    *         of the left segment, split_id — idCol at that index,
    *         gain) */
  def bestChangepoint(df: DataFrame, keys: Seq[String], tsCol: String,
                      idCol: String, valCol: String,
                      minSeg: Int = 2): DataFrame = {
    require(minSeg >= 1, "minSeg must be >= 1")
    val kcols = keys.map(col)
    def dec(c: Column): Column =
      round(c.cast("double"), 6).cast("decimal(18,6)")
    val w = Window.partitionBy(kcols: _*).orderBy(col(tsCol), col(idCol))
    val wAll = Window.partitionBy(kcols: _*)
    val pre = df.select(kcols :+ col(tsCol) :+ col(idCol) :+
        dec(col(valCol)).as("__v"): _*)
      .withColumn("__i", row_number().over(w))
      .withColumn("__s", sum(col("__v"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__q", sum((col("__v") * col("__v"))
          .cast("decimal(38,12)"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__st", sum(col("__v")).over(wAll))
      .withColumn("__qt", sum((col("__v") * col("__v"))
        .cast("decimal(38,12)")).over(wAll))
    val iD = col("__i").cast("double")
    val nD = col("__n").cast("double")
    val sD = col("__s").cast("double")
    val qD = col("__q").cast("double")
    val stD = col("__st").cast("double")
    val qtD = col("__qt").cast("double")
    val cost = round(
      (qD - sD * sD / iD) +
        ((qtD - qD) - (stD - sD) * (stD - sD) / (nD - iD)), 6)
    val sse = round(qtD - stD * stD / nD, 6)
    val scored = pre
      .filter(col("__n") >= 2 * minSeg &&
        col("__i") >= minSeg && col("__i") <= col("__n") - minSeg)
      .withColumn("__cost", cost)
      .withColumn("__sse", sse)
    val wRank = Window.partitionBy(kcols: _*)
      .orderBy(col("__cost"), col("__i"))
    scored.withColumn("__rn", row_number().over(wRank))
      .filter(col("__rn") === 1)
      .select(kcols :+ col("__i").cast("long").as("split_idx") :+
        col(idCol).as("split_id") :+
        round(col("__sse") - col("__cost"), 6).as("gain"): _*)
  }

  /** Rolling robust anomaly detection — per key, each value judged
    * against the MEDIAN and MAD (median absolute deviation) of its
    * trailing `lookback`-row frame: |v − med| > k·MAD flags the
    * spike. Median/MAD are the robust pair (a single prior outlier
    * inflates a rolling mean/stddev and masks the next one; the
    * breakdown point of the median is 50%).
    *
    * Determinism contract: values round once to 6 (decimal); the
    * median is the LOWER median — element ⌈n/2⌉ of the sorted frame,
    * no interpolation, so it is always a value that OCCURS and every
    * comparison is exact decimal; MAD is the lower median of the
    * absolute deviations; the threshold compare is decimal (k
    * integer). No doubles anywhere, nothing to round differently.
    *
    * Scale shape: ONE key-hash exchange; the frame array is
    * `lookback` elements per row (collect_list over a rows-frame) and
    * the median/MAD extraction is a codegen'd sort over that bounded
    * array — cost lookback·log(lookback) per row, state bounded by
    * construction (no maxEvents cap needed: the frame IS the cap).
    *
    * @return (keys…, idCol, value, med, mad, is_anomaly) */
  def rollingMadAnomaly(df: DataFrame, keys: Seq[String], tsCol: String,
                        idCol: String, valCol: String,
                        lookback: Int = 25, k: Int = 3): DataFrame = {
    require(lookback >= 2, "lookback must be >= 2")
    require(k >= 1, "k must be >= 1")
    val kcols = keys.map(col)
    def dec(c: Column): Column =
      round(c.cast("double"), 6).cast("decimal(18,6)")
    val w = Window.partitionBy(kcols: _*)
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(-(lookback - 1), Window.currentRow)
    val arr = sort_array(collect_list(dec(col(valCol))).over(w))
    val lowerMed = (a: Column) =>
      element_at(a, ((size(a) + 1) / 2).cast("int"))
    val withMed = df
      .select(kcols :+ col(tsCol) :+ col(idCol) :+
        dec(col(valCol)).as("__v") :+ arr.as("__fr"): _*)
      .withColumn("__med", lowerMed(col("__fr")))
    val devs = sort_array(transform(col("__fr"),
      x => abs(x - col("__med")).cast("decimal(18,6)")))
    withMed
      .withColumn("__mad", lowerMed(devs))
      .select(kcols :+ col(idCol) :+
        col("__v").cast("double").as("value") :+
        col("__med").cast("double").as("med") :+
        col("__mad").cast("double").as("mad") :+
        (abs(col("__v") - col("__med")) >
          lit(k) * col("__mad")).as("is_anomaly"): _*)
  }

  /** Seasonal-adjusted Holt (the additive Holt–Winters decomposition
    * as a composition, not a third recurrence): the hour-of-day
    * seasonal profile — per-key mean offset of each hour vs the
    * key's overall mean, the a27_seasonal statistic — is subtracted,
    * [[holt]] smooths the deseasonalized series, and the offset adds
    * back into the fitted value. Decomposing this way keeps the
    * loop-carried state identical to [[holt]]'s (two decimal longs
    * per key) instead of adding a period-sized seasonal array to the
    * fold, and the seasonal profile is an honest corpus statistic
    * rather than one more smoothed estimate.
    *
    * Cross-engine determinism: a MEAN OF 6-DP DECIMALS is
    * structurally half-way-prone (two values 1e-6 apart average onto
    * an exact .5 ulp — measured: engines split on one offset at
    * sf0.01), so the offset is computed in INTEGER micro-units with
    * explicit half-away-from-zero rounding: n = sv·ct − st·cv
    * micro-units (exact decimal(38,0)), d = cv·ct, and
    * round(n/d) = sign·((2·|n| + d) div (2·d)) — integer division
    * truncates positives identically in both engines, so the offset
    * is engine-free BY CONSTRUCTION, not by luck. The
    * deseasonalized value re-rounds once; the Holt recurrence is
    * [[holt]]'s exact decimal chain; fitted = one final round of
    * (level+trend)+s.
    *
    * Scale shape: the profile is a (keys × 24)-row frame (two hash
    * aggs + one key-frame join); attaching it shuffles the fact on
    * (keys, hour) — AQE broadcasts the profile when small — and the
    * recurrence rides [[holt]]'s single key exchange; the final
    * seasonal re-attach joins on (keys, id).
    *
    * @return (keys…, idCol, level, trend, seasonal, fitted) */
  def holtSeasonal(df: DataFrame, keys: Seq[String], tsCol: String,
                   idCol: String, valCol: String, alpha: Double,
                   beta: Double): DataFrame = {
    val kcols = keys.map(col)
    def dec(c: Column): Column =
      round(c.cast("double"), 6).cast("decimal(18,6)")
    val withH = df.select(kcols :+ col(tsCol) :+ col(idCol) :+
      hour(col(tsCol)).as("__h") :+ dec(col(valCol)).as("__vd"): _*)
      .withColumn("__v6", (col("__vd") * lit(1000000L)).cast("long"))
    val off = withH.groupBy(kcols :+ col("__h"): _*)
      .agg(sum(col("__v6")).as("__sv6"), count(lit(1)).as("__cv"))
    val tot = off.groupBy(kcols: _*)
      .agg(sum(col("__sv6")).as("__st6"), sum(col("__cv")).as("__ct"))
    val sTab = off.join(tot, keys)
      .withColumn("__n",
        col("__sv6").cast("decimal(38,0)") * col("__ct") -
          col("__st6").cast("decimal(38,0)") * col("__cv"))
      .withColumn("__d", (col("__cv") * col("__ct")).cast("decimal(38,0)"))
      .withColumn("__r", expr("(2 * abs(__n) + __d) div (2 * __d)"))
      .select(kcols :+ col("__h") :+
        dec(when(col("__n") < 0, -col("__r")).otherwise(col("__r"))
          .cast("double") / lit(1000000.0)).as("__s"): _*)
    val adj = withH.join(sTab, keys :+ "__h")
      .withColumn("__vadj", dec(col("__vd") - col("__s")))
    val smoothed = holt(adj, keys, tsCol, idCol, "__vadj", alpha, beta)
    smoothed
      .join(adj.select(kcols :+ col(idCol) :+ col("__s"): _*),
        keys :+ idCol)
      .select(kcols :+ col(idCol) :+ col("level") :+ col("trend") :+
        col("__s").cast("double").as("seasonal") :+
        round(col("forecast") + col("__s").cast("double"), 6)
          .as("fitted"): _*)
  }
}
