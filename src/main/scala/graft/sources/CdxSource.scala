package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CDX(J) crawl-index support — the OTHER half of consuming a web
  * crawl at scale. Common Crawl ships, beside every WARC shard, a
  * sorted index whose lines are
  *
  *   `<SURT key> <14-digit timestamp> {"url": ..., "mime": ...,
  *    "status": ..., "digest": ..., "length": ..., "offset": ...,
  *    "filename": ...}`
  *
  * (the CDXJ form: pywb / webarchive-commons lineage; the JSON
  * block's numeric fields are JSON STRINGS as shipped). Real crawl
  * consumers do not scan 100 TB of WARC — they scan the ~1 %-sized
  * index, filter (host, mime, status, dedup digest), and then fetch
  * ONLY the selected records by `(filename, offset, length)` pointer.
  * [[readCdxj]] is the index scan, [[readRecordsAt]] is the pointed
  * fetch, and [[graft.text.UrlOps.surtKey]] builds the index key for
  * the write side.
  *
  * Scale shape: the index scan is `spark.read.text` + ONE projection
  * (a 3-way bounded split and a single `from_json` — the house
  * one-parse rule), so filters on the parsed columns prune before
  * any WARC byte moves. The pointed fetch is shuffle-free: pointers
  * are sorted WITHIN partitions by (file, offset) so each task opens
  * a file handle once per file-run and seeks monotonically — per-task
  * I/O is O(selected bytes), never O(corpus). Callers who know the
  * selection is dense in few files MAY `repartition($"warc_file")`
  * first for handle locality; the default adds no exchange.
  *
  * Format reference: /root/reference has no crawl-index counterpart;
  * the CDXJ shape follows the public pywb/Common Crawl convention.
  */
object CdxSource {

  /** JSON block schema — every field a STRING as shipped (numeric
    * fields are quoted in CDXJ); typed casts happen in the select. */
  private val JsonSchema = org.apache.spark.sql.types.StructType(
    Seq("url", "mime", "status", "digest", "length", "offset",
      "filename").map(n =>
      org.apache.spark.sql.types.StructField(n,
        org.apache.spark.sql.types.StringType)))

  /** Scan CDXJ lines into typed columns: `surt_key`, `fetch_ts`
    * (the raw 14-digit string — lexicographically ordered, the
    * crawl convention), `url`, `mime`, `status` (int), `digest`,
    * `warc_length`/`warc_offset` (long), `warc_file`, `malformed`.
    * A line that does not split into three fields, whose JSON block
    * fails to parse, or whose timestamp is not 14 digits comes back
    * `malformed = true` with the raw line in `url` — the quarantine
    * convention: a junk line never fails the scan and never
    * silently vanishes. */
  def readCdxj(spark: SparkSession, path: String): DataFrame = {
    val parts = split(col("value"), " ", 3)
    val ts = parts.getItem(1)
    val j = from_json(parts.getItem(2), JsonSchema)
    val ok = size(parts) === 3 && ts.rlike("^[0-9]{14}$") &&
      j.isNotNull && j.getField("url").isNotNull
    spark.read.textFile(path).toDF()
      .select(
        when(ok, parts.getItem(0)).as("surt_key"),
        when(ok, ts).as("fetch_ts"),
        when(ok, j.getField("url")).otherwise(col("value")).as("url"),
        when(ok, j.getField("mime")).as("mime"),
        when(ok, j.getField("status").cast("int")).as("status"),
        when(ok, j.getField("digest")).as("digest"),
        when(ok, j.getField("length").cast("long")).as("warc_length"),
        when(ok, j.getField("offset").cast("long")).as("warc_offset"),
        when(ok, j.getField("filename")).as("warc_file"),
        (!ok).as("malformed"))
  }

  /** Fetch ONLY the records the pointers name: `pointers` must carry
    * `warc_file` (a path the executors can open — absolute or
    * FS-qualified), `warc_offset`, `warc_length`. Each pointed range
    * is one gzip MEMBER (the Common Crawl per-record layout) or one
    * raw record; it is read fully, inflated if gzip-magic'd, and run
    * through the same record parser as the streaming scan —
    * quarantine semantics included, so a stale pointer yields a
    * `malformed` row, not a failed job. Output columns are
    * [[WarcSource.readRecords]]'s, with `rec_index` carrying the
    * BYTE OFFSET (the stable unique id of a pointed fetch; ordinal
    * position is meaningless when you skip). */
  def readRecordsAt(spark: SparkSession, pointers: DataFrame,
                    maxPayloadBytes: Long = 64L << 20): DataFrame = {
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val ds = pointers
      .select(col("warc_file").cast("string"),
        col("warc_offset").cast("long"), col("warc_length").cast("long"))
      .sortWithinPartitions("warc_file", "warc_offset")
      .as[(String, Long, Long)]
    ds.mapPartitions { it =>
      var curFile: String = null
      var in: org.apache.hadoop.fs.FSDataInputStream = null
      def open(f: String): org.apache.hadoop.fs.FSDataInputStream = {
        if (f != curFile) {
          if (in != null) in.close()
          val p = new org.apache.hadoop.fs.Path(f)
          in = p.getFileSystem(conf.value).open(p)
          curFile = f
        }
        in
      }
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit] { _ =>
          if (in != null) in.close()
        })
      it.flatMap { case (f, off, len) =>
        // a pointer that names no parseable record must SURFACE as a
        // quarantine row, not vanish (zero-row parse) or fail the
        // task (corrupt gzip member, seek/read past EOF) — stale
        // pointers are routine when index and archive drift
        def stale(err: String) = Seq(WarcSource.WarcRow(f, off, null,
          null, null, null, null, -1L, null, malformed = true,
          s"stale pointer: $err", null, null))
        try {
          // the raw member read allocates BEFORE any parse-side cap
          // can apply — a drifted/hostile index length must not OOM
          // the task (compressed size ≤ payload size for any sane
          // member, so the payload cap bounds it)
          if (len < 0 || len > maxPayloadBytes)
            throw new java.io.IOException(
              s"pointed length $len outside [0, $maxPayloadBytes]")
          val s = open(f)
          s.seek(off)
          val buf = new Array[Byte](len.toInt)
          s.readFully(buf)
          val bis = new java.io.BufferedInputStream(
            new java.io.ByteArrayInputStream(buf))
          bis.mark(2)
          val b0 = bis.read(); val b1 = bis.read()
          bis.reset()
          val body: java.io.InputStream =
            if (b0 == 0x1f && b1 == 0x8b)
              new java.util.zip.GZIPInputStream(bis)
            else bis
          val rows = WarcSource.parseStream(body, f, maxPayloadBytes)
            .map(_.copy(rec_index = off)).toSeq
          if (rows.isEmpty) stale("no record in pointed range")
          else rows
        } catch {
          case scala.util.control.NonFatal(e) =>
            // the handle may be poisoned mid-read — reopen next time
            if (in != null) { in.close(); in = null; curFile = null }
            stale(Option(e.getMessage)
              .getOrElse(e.getClass.getSimpleName))
        }
      }
    }.toDF()
  }
}
