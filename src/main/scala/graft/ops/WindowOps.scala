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
}
