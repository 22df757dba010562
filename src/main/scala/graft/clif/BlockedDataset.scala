package graft.clif

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.WindowOps
import graft.text.TextOps

/** The reference's promised CAPSTONE artifact — "a blocked dataset to
  * develop a model to predict the probability of death the moment a
  * patient enters the ICU" (`/root/reference/README.md:2`): ONE
  * per-(encounter, hour) feature matrix composed from the pipeline
  * stages that are each already oracled on their own —
  *
  *   1. the hourly encounter grid with last-observation-carried-
  *      forward ([[graft.ops.WindowOps.resampleLocf]] — the `w6`
  *      stage),
  *   2. per-channel staleness-bounded as-of joins ("latest vital
  *      within 2 h, latest lab within 24 h, else missing" —
  *      [[graft.ops.Joins.asOfJoinTolerance]], the `j10` stage),
  *   3. trailing rolling-window features over the grid (the `w7`
  *      stage),
  *   4. an encounter-level outcome label (mortality analog) joined
  *      onto every hour of the encounter, and
  *   5. a LEAKAGE-SAFE train/val/test split: the portable-hash split
  *      keys on the ENCOUNTER, so every hour of one encounter lands
  *      in exactly one split (the `t_hash_split`/`t_leakage_split`
  *      discipline — rows of one subject never straddle splits).
  *
  * Scale shape: ALL channels are carried onto the grid in ONE
  * encounter-keyed window pass — the multi-channel generalization of
  * the as-of union trick (grid rows and every channel's deduped
  * observations union into one frame; one running
  * `last(ignoreNulls)` per channel over the same
  * (encounter)-partitioned (t, tag) ordering). N sequential as-of
  * joins would cost N grid-sized exchange+sort passes; this costs
  * one, and the trailing rolling window REUSES that exchange and
  * sort (same partitioning, prefix-compatible ordering — zero
  * additional shuffles between LOCF and rolling features). The grid
  * is |encounters| × span-hours rows, never an all-pairs product;
  * the label frame is one row per encounter (hash-agg, then an
  * equi-join Catalyst is free to broadcast when small). Channel
  * streams are filtered and deduped BEFORE the union, so the big
  * pass carries only real observations plus the grid.
  *
  * Determinism: dedup-keep-last tiebreaks on an explicit unique
  * column; the rolling mean follows the `w7` numerics (exact
  * decimal(30,6) sums, ONE double division rounded once); the split
  * hash is the SQL-portable Knuth multiplicative hash, NON-NEGATIVE
  * by construction (`pmod` here; a replaying engine whose `%` is
  * sign-preserving — DuckDB, standard SQL — must wrap the chain in
  * an explicit `((x % m) + m) % m`, as the shipped oracle does), so
  * the split assignment is engine-identical for ALL long encounter
  * keys, negatives included (r14 ADVICE). */
object BlockedDataset {

  /** One feature channel: stream rows whose `channelCol` equals
    * `value`, carried onto the grid by an as-of join that attaches
    * NULL when the latest observation is older than
    * `toleranceSeconds` (missingness stays honest — a stale vital is
    * a missing vital, the reference's clinical-feature rule). */
  final case class Channel(value: String, outCol: String,
                           toleranceSeconds: Long)

  /** Assemble the blocked dataset.
    *
    * @param events    long event stream: one row per observation
    * @param encCol    encounter key (grid, joins, label, split)
    * @param tsCol     observation timestamp
    * @param channelCol discriminator column for [[Channel]]s
    * @param valueCol  numeric observation value
    * @param tiebreak  unique column breaking (encCol, tsCol) ties
    *                  deterministically (keep-last)
    * @param channels  staleness-bounded feature channels
    * @param stepSeconds grid step (3600 = the reference's hourly)
    * @param outcome   encounter-level outcome predicate over raw
    *                  stream rows (label = 1 iff ANY row matches)
    * @param rollRows  trailing grid rows (incl. current) in the
    *                  rolling mean
    * @param trainPct/valPct split percentages (test = remainder)
    * @return one row per (encounter, grid hour): encCol, grid_ts,
    *         last_value, one column per channel, roll_avg,
    *         label (0/1 long), split ('train'/'val'/'test') */
  def build(events: DataFrame, encCol: String, tsCol: String,
            channelCol: String, valueCol: String, tiebreak: String,
            channels: Seq[Channel], stepSeconds: Long,
            outcome: Column, rollRows: Int,
            trainPct: Int, valPct: Int): DataFrame = {
    require(rollRows >= 1, "rollRows must be >= 1")
    require(trainPct > 0 && valPct > 0 && trainPct + valPct < 100,
      "need 0 < trainPct, 0 < valPct, trainPct + valPct < 100")
    require(channels.map(_.outCol).distinct.size == channels.size,
      "channel outCols must be distinct")

    // 1. deduped observation streams — ONE hash aggregation (r20 opt,
    //    guide §2.3/§2.4). Keep-last per (encounter, ts) for the base
    //    series AND per channel used to be three window-sort passes (a
    //    full corpus exchange+sort each, plus their scans); max over
    //    struct(tiebreak, payload) per stream computes the same row in
    //    one map-side-combining agg on one exchange:
    //      · struct comparison orders by tiebreak first, so max IS
    //        keep-last-by-tiebreak (the w6/j10 dedup contract; the
    //        tiebreak contract — see @param — makes ties/null-tiebreak
    //        groups a caller bug in both shapes);
    //      · when(channelCond, …) leaves non-channel rows null and
    //        agg max ignores nulls, so each channel dedups over
    //        exactly its own filtered stream;
    //      · the merged frame carries one row per (enc, ts) with ALL
    //        payload columns, where the union carried up to 1+|C|
    //        rows — the downstream LOCF last(ignoreNulls) reads the
    //        same values at the same (t, tag) positions, and only
    //        grid rows survive the pass, so the result is row-equal.
    //    The encounter-level OUTCOME pre-aggregates here too (max of
    //    the 0/1 predicate is associative), so the label frame becomes
    //    a rollup of this agg instead of a second corpus scan.
    def lastBy(cond: Column, out: String): Column =
      max(when(cond, struct(col(tiebreak).as("tb"),
          struct(col(valueCol).as("v"), col(tsCol).as("mt")).as("p"))))
        .getField("p").as(s"__p_$out")
    val allOut = "last_value" +: channels.map(_.outCol)
    val obsAggs = lastBy(lit(true), "last_value") +:
      channels.map(ch =>
        lastBy(col(channelCol) === ch.value, ch.outCol)) :+
      max(when(outcome, 1L).otherwise(0L)).as("__lbl")
    val obs = events
      .groupBy(col(encCol), col(tsCol).as("__t"))
      .agg(obsAggs.head, obsAggs.tail: _*)
      .withColumn("__tag", lit(0))

    // 2. the hourly encounter grid (the w6 grid), tagged AFTER the
    //    observations at equal time so an on-the-hour observation
    //    matches its own hour (the as-of >= convention); the grid
    //    bounds roll up from the deduped frame (same distinct
    //    (enc, ts) set as the raw stream)
    val grid = obs
      .groupBy(col(encCol))
      .agg(date_trunc("hour", min(col("__t"))).as("__g0"),
        max(col("__t")).as("__t1"))
      .select(col(encCol),
        explode(expr(
          s"sequence(__g0, __t1, interval $stepSeconds second)"))
          .as("__t"))
      .withColumn("__tag", lit(1))

    // 3. ALL channels LOCF'd in ONE encounter-keyed window pass —
    //    the multi-channel generalization of the as-of union trick
    //    (N sequential as-of joins would cost N grid-sized
    //    exchange+sort passes; one running `last(ignoreNulls)` per
    //    channel over the same frame costs one), then the per-channel
    //    staleness null-out (the j10 rule), then the trailing rolling
    //    mean (the w7 numerics) — which REUSES the exchange and sort
    //    (same partitioning, prefix-compatible ordering).
    val wLocf = Window.partitionBy(col(encCol))
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    def secs(c: Column): Column = c.cast("timestamp_ltz").cast("long")
    val carried = allOut.foldLeft(
      grid.unionByName(obs, allowMissingColumns = true))((d, out) =>
      d.withColumn(s"__l_$out",
        last(col(s"__p_$out"), ignoreNulls = true).over(wLocf)))
      .filter(col("__tag") === 1)
    val fresh = carried
      .withColumn("last_value", col("__l_last_value.v"))
      .select(col(encCol) +: col("__t") +: col("last_value") +:
        channels.map { ch =>
          val p = col(s"__l_${ch.outCol}")
          when(p.isNull or
            secs(col("__t")) - secs(p("mt")) > ch.toleranceSeconds,
            lit(null)).otherwise(p("v")).as(ch.outCol)
        }: _*)
    val wRoll = Window.partitionBy(col(encCol)).orderBy(col("__t"))
      .rowsBetween(-(rollRows - 1), 0)
    val feat = fresh.withColumn("roll_avg",
        round(sum(col("last_value").cast("decimal(30,6)")).over(wRoll)
          .cast("double") / count(col("last_value")).over(wRoll), 6))
      .withColumnRenamed("__t", "grid_ts")

    // 4. encounter-level outcome label — rollup of the step-1 agg's
    //    per-(enc, ts) outcome max (max is associative; every raw row
    //    belongs to exactly one (enc, ts) group, so the encounter set
    //    and the 0/1 label match the raw-stream agg row for row)
    val labels = obs.groupBy(col(encCol))
      .agg(max(col("__lbl")).as("label"))

    // 5. leakage-safe split: hash the ENCOUNTER key
    val h = pmod(TextOps.portableHash(col(encCol)), lit(100))
    feat.join(labels, Seq(encCol))
      .withColumn("split",
        when(h < trainPct, lit("train"))
          .when(h < trainPct + valPct, lit("val"))
          .otherwise(lit("test")))
  }
}
