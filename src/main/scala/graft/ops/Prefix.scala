package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bucketed hierarchical prefix sums — the house discipline for
  * "cumulative over a distinct-value frame" without a single-partition
  * global window ([[Quality.ksTwoSample]] / [[Quality.rocAuc]] /
  * `sequenceGaps` all carry the inlined two-level shape; this is the
  * same plan as a reusable, per-group helper for new order-statistic
  * operators).
  *
  * Given a frame with ONE row per (group, key) and long measure
  * columns, appends, for every measure `m`, a column `__below_m` =
  * the sum of `m` over rows of the SAME group with a strictly smaller
  * key. Two-level plan: an intra-bucket running sum rides a parallel
  * (group, bucket) window; only the per-(group, bucket) totals frame —
  * key-range/bucketSize rows per group — crosses the per-group
  * cross-bucket window, which itself parallelizes across groups.
  * Truncating `div` bucket ids are order-monotonic for negative keys
  * too (bucket 0 simply spans (−bucketSize, bucketSize)), which is all
  * the hierarchy needs.
  */
object Prefix {

  /** @param df ONE row per (groupCols, keyCol); measures are longs
    * @param keyCol long-valued ordering key (micro-units by repo
    *        convention)
    * @return df plus `__below_<m>` for every measure `m` */
  def strictBelow(df: DataFrame, groupCols: Seq[String], keyCol: String,
                  measures: Seq[String],
                  bucketSize: Long = 1048576L): DataFrame = {
    require(bucketSize >= 2, "bucketSize must be >= 2")
    require(measures.nonEmpty, "need at least one measure")
    val g = groupCols.map(col)
    val withB = df.withColumn("__pfxb", expr(s"$keyCol div $bucketSize"))
    val wIn = Window.partitionBy((g :+ col("__pfxb")): _*)
      .orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val intra = measures.foldLeft(withB) { (d, m) =>
      d.withColumn(s"__in_$m",
        coalesce(sum(col(m)).over(wIn), lit(0L)))
    }
    val perBucket = withB.groupBy((g :+ col("__pfxb")): _*)
      .agg(sum(col(measures.head)).as(s"__bt_${measures.head}"),
        measures.tail.map(m => sum(col(m)).as(s"__bt_$m")): _*)
    val wCross = Window.partitionBy(g: _*).orderBy(col("__pfxb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = measures.foldLeft(perBucket) { (d, m) =>
        d.withColumn(s"__off_$m",
          coalesce(sum(col(s"__bt_$m")).over(wCross), lit(0L)))
      }
      .select((g :+ col("__pfxb")) ++
        measures.map(m => col(s"__off_$m")): _*)
    val joined = intra.join(offsets,
      groupCols :+ "__pfxb")
    val withBelow = measures.foldLeft(joined) { (d, m) =>
      d.withColumn(s"__below_$m", col(s"__in_$m") + col(s"__off_$m"))
    }
    withBelow.drop("__pfxb")
      .drop(measures.flatMap(m => Seq(s"__in_$m", s"__off_$m")): _*)
  }
}
