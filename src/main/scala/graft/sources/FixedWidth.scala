package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-width (mainframe/COBOL-extract) text ingestion — the last
  * delimiter-less flat-file family next to the chunked CSV scan
  * (`ClifEtl`) and the xlsx/http sources. The reference ingests only
  * delimited extracts (`code/RCLIF_labs.Rmd:24` reads csv chunks), but
  * any hospital-adjacent warehouse eventually receives the EHR vendor's
  * fixed-layout dump; a 100 TB engine needs the boring path.
  *
  * Plan shape: `spark.read.text` line-splits in parallel like any text
  * scan (HDFS-style line splitting — no whole-file reads), and the
  * column extraction is a pure `substring`/`trim`/`cast` projection:
  * one narrow codegen'd pass, zero UDFs, zero shuffles. Malformed
  * numerics follow the engine's cast-to-null convention (ANSI off via
  * GraftSession.tune) — quarantine rows with `isNull` filters
  * downstream, the s5_jsonl_corrupt pattern.
  */
object FixedWidth {

  /** One column of the layout: 1-based `start`, byte `len`, and the
    * Spark SQL `dtype` to cast the trimmed slice to. */
  case class FwCol(name: String, start: Int, len: Int,
                   dtype: String = "string")

  def read(spark: SparkSession, path: String,
           layout: Seq[FwCol]): DataFrame = {
    require(layout.nonEmpty, "layout must have at least one column")
    layout.foreach(c => require(c.start >= 1 && c.len >= 1,
      s"bad layout for ${c.name}: start/len must be >= 1"))
    spark.read.text(path).select(layout.map(c =>
      trim(substring(col("value"), c.start, c.len))
        .cast(c.dtype).as(c.name)): _*)
  }

  /** Render `df` as fixed-width lines under `layout` using printf-style
    * per-column formats (the write half of the roundtrip spec; numeric
    * columns right-aligned, strings left-padded with `%-Ns`). Columns
    * are matched to `formats` by position. */
  def write(df: DataFrame, formats: Seq[String], outDir: String): Unit = {
    require(formats.size == df.columns.length,
      "one format per dataframe column")
    df.select(format_string(formats.mkString(""),
        df.columns.map(col).toIndexedSeq: _*).as("value"))
      .write.mode("overwrite").text(outDir)
  }
}
