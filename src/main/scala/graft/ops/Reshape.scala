package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reshape operators (SURVEY.md §2.7 R1–R4).
  *
  * Mirrors the reference's tidyr verbs: `pivot_longer`
  * (`code/RCLIF_vitals.Rmd:50`), `pivot_wider` (`code/RCLIF_vitals.Rmd:
  * 108-114`), `separate` (`code/RCLIF_vitals.Rmd:48`), `unnest`
  * (`code/RCLIF_medications.Rmd:122-125`). All are narrow except the pivot,
  * whose groupBy is a single hash-agg shuffle on the id columns.
  */
object Reshape {

  /** R3 `separate`: split one string column into N new columns.
    * "120/80" -> sbp=120, dbp=80. Missing trailing pieces become null
    * (Spark getItem on short arrays yields null, matching tidyr's
    * fill="right" warning behavior).
    */
  def separate(df: DataFrame, src: String, sepRegex: String,
               into: Seq[String], keepSrc: Boolean = true): DataFrame = {
    val parts = split(col(src), sepRegex)
    val out = into.zipWithIndex.foldLeft(df) { case (d, (name, i)) =>
      d.withColumn(name, parts.getItem(i))
    }
    if (keepSrc) out else out.drop(src)
  }

  /** R1 `pivot_longer`: wide -> long. Uses Spark's native unpivot (3.4+),
    * which is a narrow Expand — no shuffle. Null values are dropped to
    * match tidyr's values_drop_na=TRUE usage sites.
    */
  def unpivot(df: DataFrame, ids: Seq[String], values: Seq[String],
              nameCol: String, valueCol: String,
              dropNulls: Boolean = false): DataFrame = {
    val long = df.unpivot(ids.map(col).toArray, values.map(col).toArray,
      nameCol, valueCol)
    if (dropNulls) long.filter(col(valueCol).isNotNull) else long
  }

  /** R2 `pivot_wider`: long -> wide, one column per known name.
    * Passing `names` explicitly keeps the plan single-pass (no extra
    * distinct-scan to discover names) — at 100 TB the name-discovery scan
    * is a full extra pass over the fact table, so the vocabulary must be
    * a declared dimension, never inferred.
    *
    * Duplicate (ids, name) keys: the reference's pivot_wider warns and
    * makes list-columns; we pin first-by-order semantics via an explicit
    * aggregate (SURVEY.md §7.1). Default agg keeps ANY first value
    * (non-deterministic under shuffle) — pass e.g. min/max for stable runs.
    */
  def pivotWider(df: DataFrame, ids: Seq[String], nameCol: String,
                 valueCol: String, names: Seq[String],
                 agg: Column => Column = first(_, ignoreNulls = true))
      : DataFrame =
    df.groupBy(ids.map(col): _*)
      .pivot(nameCol, names)
      .agg(agg(col(valueCol)))

  /** R4 `unnest`: explode an array column to one row per element. */
  def unnest(df: DataFrame, arrCol: Column, as: String,
             keep: Seq[String]): DataFrame =
    df.select(keep.map(col) :+ explode(arrCol).as(as): _*)
}
