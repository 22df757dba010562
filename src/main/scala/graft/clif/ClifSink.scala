package graft.clif

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.ops.Scalars

/** CLIF output sinks (SURVEY.md §2.1 S5/S6) with the physical-layout
  * decisions from §4:
  *  - parquet partitioned by event-time date (P8 date filters prune);
  *  - sorted within partitions by (encounter, time) so downstream
  *    windows/merge-joins over an encounter read clustered data;
  *  - CSV renders timestamps as the reference's "yyyy-MM-dd HH:mm:ss"
  *    strings (internal representation stays TimestampType).
  */
object ClifSink {

  /** Write partitioned parquet. `eventTimeCol`, when given, derives a
    * `p_date` partition column — at 100 TB the date partition is what
    * makes time-range queries not scan the world. */
  def parquet(df: DataFrame, path: String, eventTimeCol: Option[String] = None,
              sortCols: Seq[String] = Nil): Unit = {
    val (out, partCols) = eventTimeCol match {
      case Some(t) =>
        (df.withColumn("p_date", to_date(col(t))), Seq("p_date"))
      case None => (df, Nil)
    }
    val sorted =
      if (sortCols.nonEmpty) out.sortWithinPartitions(sortCols.map(col): _*)
      else out
    val w = sorted.write.mode("overwrite")
    (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w).parquet(path)
  }

  /** Write header CSV, timestamps formatted like the reference's sinks. */
  def csv(df: DataFrame, path: String): Unit = {
    val rendered = df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.dataType == TimestampType)
        d.withColumn(f.name, Scalars.tsToString(col(f.name)))
      else d
    }
    rendered.write.mode("overwrite").option("header", true).csv(path)
  }
}
