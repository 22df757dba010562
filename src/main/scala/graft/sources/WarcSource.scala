package graft.sources

import java.io.{BufferedInputStream, ByteArrayOutputStream, EOFException, InputStream}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500 — the Common Crawl container) record
  * ingestion: the missing first stage of a crawl-scale training-data
  * pipeline. A WARC file is a concatenation of records, each
  *
  * {{{
  * WARC/1.0\r\n
  * WARC-Type: response\r\n          (named fields, one per line)
  * Content-Length: N\r\n
  * \r\n
  * <N payload bytes>\r\n\r\n
  * }}}
  *
  * `response` records carry a full HTTP response (status line +
  * headers + HTML body — split with [[httpBody]]); WET files are the
  * same container holding `conversion` records whose payload is
  * already extracted text — the SAME reader reads both.
  *
  * Scale shape: the file is the parallelism unit, exactly as Common
  * Crawl ships it (~1 GB per WARC, ~90k files per crawl — records
  * inside a file are NOT independently splittable without an index,
  * and per-record gzip members make mid-file splits useless anyway).
  * [[readRecords]] uses `sparkContext.binaryFiles` — the sanctioned
  * RDD exception for genuine per-partition imperative logic — so each
  * task STREAMS its file (PortableDataStream: no whole-file
  * materialization; memory is bounded by one record's payload, itself
  * bounded by `maxPayloadBytes`), and the row conversion is a typed
  * Dataset handoff. Everything downstream is ordinary DataFrame code;
  * payload bytes never shuffle (project the fields you group on).
  *
  * Malformation policy (crawl files ARE dirty): a record that cannot
  * be parsed — bad magic, unparseable headers, payload truncated by
  * EOF — becomes a QUARANTINE row (`malformed = true`, `error` set,
  * whatever fields were recovered kept) rather than failing the scan
  * or silently vanishing; the reader then resyncs by scanning for the
  * next record magic. An over-`maxPayloadBytes` record keeps its
  * headers and drops only the payload (`payload = null`,
  * `error = "oversize:…"`, `malformed = false` — the bound is a loud,
  * observable cap, not an error). Gzip (.warc.gz) is detected by
  * magic and stream-decoded; the JDK inflater consumes concatenated
  * per-record members transparently.
  */
object WarcSource {

  /** One parsed record. `rec_index` is the record's ordinal within
    * its file (files parse sequentially, so this is deterministic);
    * header fields are null when absent/unrecovered. */
  case class WarcRow(
      source_file: String,
      rec_index: Long,
      warc_type: String,
      record_id: String,
      target_uri: String,
      warc_date: String,
      content_type: String,
      content_length: Long,
      payload: Array[Byte],
      malformed: Boolean,
      error: String,
      // the revisit-dedup linkage (ISO 28500 §6.7): a `revisit`
      // record is a re-fetch whose payload matched an earlier
      // capture — it carries the matched payload's digest and the
      // original's URI instead of the bytes; null on records that
      // don't declare them
      payload_digest: String,
      refers_to_uri: String)

  /** The hard per-record payload ceiling: a JVM byte array tops out
    * just under Int.MaxValue, so a larger `maxPayloadBytes` would
    * have to truncate silently — fail loudly at the API edge
    * instead (r19 review fix). */
  private def requirePayloadCap(maxPayloadBytes: Long): Unit =
    require(maxPayloadBytes > 0 &&
        maxPayloadBytes <= Int.MaxValue.toLong - 8,
      s"maxPayloadBytes $maxPayloadBytes out of (0, ${Int.MaxValue - 8}]:" +
        " a JVM byte array cannot hold more; records past the cap are" +
        " the oversize-drop path, not silent truncation")

  /** Read every record of every WARC/WET file under `path` (glob ok).
    * One task per file; see object doc for the scale rationale. */
  def readRecords(spark: SparkSession, path: String,
                  maxPayloadBytes: Long = 64L << 20): DataFrame = {
    import spark.implicits._
    requirePayloadCap(maxPayloadBytes)
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (file, pds) =>
        val raw = new BufferedInputStream(pds.open())
        val in =
          if (isGzip(raw)) new java.util.zip.GZIPInputStream(raw)
          else raw
        // a partially-consumed scan (limit(), failed task) never
        // exhausts the iterator, so closeOnExhaust alone would leak
        // the file handle/Inflater until executor death — the task-
        // completion hook is the backstop (close is idempotent)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => in.close()))
        closeOnExhaust(parseStream(in, file, maxPayloadBytes), in)
      }
      .toDS().toDF()
  }

  /** Streaming twin of [[readRecords]]: a file STREAM over a WARC
    * drop directory — the production crawl shape (each crawl wave
    * lands as new `.warc[.gz]` files; an AvailableNow drain folds
    * them into the corpus EXACTLY ONCE through the checkpoint's file
    * log, the BlockedDatasetIncremental discipline). The binaryFile
    * file-stream hands whole-file content per row, so memory here is
    * one FILE per task (vs one RECORD in the batch path's
    * PortableDataStream) — size crawl shards to the source's cap;
    * the parse is the SAME [[parseStream]], quarantine semantics
    * included. */
  def readRecordsStream(spark: SparkSession, dir: String,
                        maxPayloadBytes: Long = 64L << 20)
      : org.apache.spark.sql.Dataset[WarcRow] = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    spark.readStream.format("binaryFile")
      .schema(StructType(Seq(
        StructField("path", StringType),
        StructField("modificationTime", TimestampType),
        StructField("length", LongType),
        StructField("content", BinaryType))))
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        parseBytes(file, bytes, maxPayloadBytes)
      }
  }

  /** Parse one in-memory WARC file (the streaming path's per-row
    * unit; gzip by magic like the batch path). The gzip Inflater
    * holds NATIVE memory freed only by close — closeOnExhaust plus
    * the task-completion backstop release it deterministically
    * instead of at finalizer time (r19 review fix). */
  def parseBytes(file: String, bytes: Array[Byte],
                 maxPayloadBytes: Long = 64L << 20): Iterator[WarcRow] = {
    requirePayloadCap(maxPayloadBytes)
    val raw = new BufferedInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val in =
      if (isGzip(raw)) new java.util.zip.GZIPInputStream(raw) else raw
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ => in.close()))
    closeOnExhaust(parseStream(in, file, maxPayloadBytes), in)
  }

  /** HTTP response payload → body: everything after the first blank
    * line (status line and headers dropped). Pure column op on the
    * UTF-8 payload text, oracle-replayable — the IDENTITY-ENCODING
    * fast path only: a `Transfer-Encoding: chunked` body keeps its
    * chunk-size lines and a `Content-Encoding: gzip` body is
    * compressed bytes read as mojibake. Real Common Crawl response
    * records carry both routinely — use [[withHttpMessage]] for the
    * full message decode (r19 verdict #1). */
  def httpBody(payloadText: Column): Column =
    regexp_replace(payloadText, "(?s)^.*?\\r\\n\\r\\n", "")

  // ===== full HTTP message decode (r19 verdict #1) =====

  /** Columns [[withHttpMessage]] appends. */
  private val HttpFields = Seq(
    org.apache.spark.sql.types.StructField("http_status",
      org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("http_content_type",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("http_transfer_encoding",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("http_content_encoding",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("http_location",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("http_body",
      org.apache.spark.sql.types.BinaryType),
    org.apache.spark.sql.types.StructField("http_error",
      org.apache.spark.sql.types.StringType))

  /** Decode the HTTP MESSAGE LAYER of `response` record payloads —
    * the step [[httpBody]] skips: split status line + headers off,
    * undo `Transfer-Encoding: chunked` (chunk-size lines, extensions,
    * trailers), then undo `Content-Encoding: gzip|x-gzip|deflate`
    * (deflate sniffs zlib-wrapped vs raw — real servers ship both),
    * in that order — RFC 9112 applies transfer codings last, so the
    * receiver removes them first. Header fields folded across lines
    * (RFC 9112 §5.2 obs-fold — deprecated but still crawled) are
    * unfolded before matching. Appends [[HttpFields]]:
    * `http_status`, `http_content_type`, `http_transfer_encoding`,
    * `http_content_encoding` (both lowercased header values as sent),
    * `http_location` (the `Location` header AS SENT — 3xx redirect
    * targets are URI-references, often relative; resolve against the
    * record's target URI with [[graft.text.UrlOps.resolveUrl]]),
    * `http_body` (the DECODED entity bytes), `http_error`.
    *
    * This is imperative byte work (no Spark built-in inflates a
    * column), so it runs as ONE NARROW mapPartitions — zero
    * shuffles, the plan above and below stays DataFrame-shaped, and
    * only rows whose headers declare a coding pay the decode. The
    * quarantine discipline carries over: a malformed message NEVER
    * fails the scan — `http_error` says what broke and `http_body`
    * carries the best-effort bytes (raw remainder for bad chunking,
    * still-encoded bytes for an unknown/broken content coding); a
    * non-HTTP payload (WET conversion text, binary junk) passes
    * through with `http_error = "not-http"` and the payload as body.
    * Inflation is bomb-capped at `maxBodyBytes` (loud `http_error`,
    * null body — the oversize-drop convention, not truncation). */
  def withHttpMessage(df: DataFrame, payloadCol: String = "payload",
                      maxBodyBytes: Long = 64L << 20): DataFrame = {
    requirePayloadCap(maxBodyBytes)
    val schema = org.apache.spark.sql.types.StructType(
      df.schema.fields ++ HttpFields)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload =
          if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        val d = decodeHttp(payload, maxBodyBytes)
        org.apache.spark.sql.Row.fromSeq(r.toSeq ++ Seq(
          d.status, d.contentType, d.transferEncoding,
          d.contentEncoding, d.location, d.body, d.error))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  private[sources] case class HttpDecoded(
      status: java.lang.Integer, contentType: String,
      transferEncoding: String, contentEncoding: String,
      location: String, body: Array[Byte], error: String)

  /** The per-payload decode behind [[withHttpMessage]] (exposed for
    * the spec). See that method's doc for the contract. */
  private[sources] def decodeHttp(payload: Array[Byte],
      maxBodyBytes: Long): HttpDecoded = {
    if (payload == null)
      return HttpDecoded(null, null, null, null, null, null, null)
    // head/body split at the first blank line; headers are ASCII by
    // spec — ISO-8859-1 is the byte-preserving read
    val sep = indexOfBlankLine(payload)
    if (sep._1 < 0 || !startsWithHttp(payload))
      return HttpDecoded(null, null, null, null, null, payload,
        "not-http")
    val head = new String(payload, 0, sep._1, "ISO-8859-1")
    val rawBody = java.util.Arrays.copyOfRange(payload, sep._2,
      payload.length)
    val rawLines = head.split("\r\n|\n").toSeq
    // RFC 9112 §5.2 obs-fold: a header line continued onto the next
    // line (leading SP/HT) is the SAME field joined by one space —
    // unfold before matching, or the folded tail would read as its
    // own (malformed) header line and the field value would truncate
    // at the fold. The status line never legally folds; a leading-
    // blank first "header" joins onto it harmlessly (no name match).
    val lines = rawLines.tail.foldLeft(List(rawLines.head)) {
      case (acc, l) if l.nonEmpty && (l.head == ' ' || l.head == '\t') =>
        (acc.head + " " + l.trim) :: acc.tail
      case (acc, l) => l :: acc
    }.reverse
    val status = "^HTTP/\\d\\.\\d +(\\d{3})".r
      .findFirstMatchIn(lines.head).map(_.group(1).toInt)
    // last occurrence wins (proxies append); values lowercased for
    // the branch, reported as lowercased-trimmed
    def header(name: String): Option[String] = lines.tail.reverse
      .collectFirst {
        case l if l.toLowerCase(java.util.Locale.ROOT)
            .startsWith(name + ":") =>
          l.substring(name.length + 1).trim
      }
    val ct = header("content-type").orNull
    val loc = header("location").orNull
    val te = header("transfer-encoding")
      .map(_.toLowerCase(java.util.Locale.ROOT)).orNull
    val ce = header("content-encoding")
      .map(_.toLowerCase(java.util.Locale.ROOT)).orNull
    // 1) transfer coding off (applied last by the sender)
    val (dechunked, chunkErr) =
      if (te != null && te.contains("chunked")) dechunk(rawBody)
      else (rawBody, null)
    // 2) content coding off
    val (body, ceErr) =
      if (chunkErr != null) (dechunked, null) // keep the first error
      else ce match {
        case null | "" | "identity" => (dechunked, null)
        case "gzip" | "x-gzip" =>
          inflate(dechunked, gzip = true, maxBodyBytes)
        case "deflate" =>
          inflate(dechunked, gzip = false, maxBodyBytes)
        case other =>
          (dechunked, s"unsupported content-encoding: $other")
      }
    HttpDecoded(status.map(Int.box).orNull, ct, te, ce, loc, body,
      if (chunkErr != null) chunkErr else ceErr)
  }

  private def startsWithHttp(p: Array[Byte]): Boolean =
    p.length >= 5 && p(0) == 'H' && p(1) == 'T' && p(2) == 'T' &&
      p(3) == 'P' && p(4) == '/'

  /** (head length, body start) of the first CRLFCRLF or LFLF; (-1,-1)
    * when the message has no blank line. */
  private def indexOfBlankLine(p: Array[Byte]): (Int, Int) = {
    var i = 0
    while (i < p.length - 1) {
      if (p(i) == '\n') {
        if (p(i + 1) == '\n') return (i, i + 2)
        if (i + 2 < p.length && p(i + 1) == '\r' && p(i + 2) == '\n')
          return (i, i + 3)
      }
      i += 1
    }
    (-1, -1)
  }

  /** RFC 9112 §7.1 chunked decoding: `<hex-size>[;ext]CRLF data CRLF`
    * repeated, `0` chunk ends, trailers (if any) to the blank line
    * are consumed and discarded. Bare-LF line ends tolerated (crawl
    * reality), hex size case-insensitive. Malformed → (raw remainder,
    * error) — quarantine, not failure. */
  private[sources] def dechunk(raw: Array[Byte])
      : (Array[Byte], String) = {
    val out = new ByteArrayOutputStream(math.min(raw.length, 1 << 16))
    var i = 0
    def readLn(): String = {
      val sb = new StringBuilder
      while (i < raw.length && raw(i) != '\n') {
        sb.append(raw(i).toChar); i += 1
      }
      if (i < raw.length) i += 1 // consume LF
      val s = sb.toString
      if (s.endsWith("\r")) s.dropRight(1) else s
    }
    while (true) {
      if (i >= raw.length)
        return (raw, "chunked: truncated before the 0 chunk")
      val sizeLine = readLn()
      val hexPart = sizeLine.split(";")(0).trim
      val size =
        try java.lang.Long.parseLong(hexPart, 16)
        catch {
          case _: NumberFormatException =>
            return (raw, s"chunked: bad size line '${
              sizeLine.take(40)}'")
        }
      if (size == 0) {
        // trailers to the blank line (or EOF — tolerated)
        var t = readLn()
        while (t.nonEmpty && i < raw.length) t = readLn()
        return (out.toByteArray, null)
      }
      if (i + size > raw.length)
        return (raw, s"chunked: chunk of $size bytes truncated at ${
          raw.length - i}")
      out.write(raw, i, size.toInt)
      i += size.toInt
      // chunk-terminating CRLF/LF
      if (i < raw.length && raw(i) == '\r') i += 1
      if (i < raw.length && raw(i) == '\n') i += 1
    }
    throw new IllegalStateException("unreachable")
  }

  /** Inflate a gzip or deflate body, capped at `max` output bytes
    * (decompression-bomb guard: loud error + null body past it).
    * `deflate` sniffs the zlib wrapper by its header bytes —
    * `0x78 ..` with a valid check — and falls back to a RAW inflater
    * otherwise (both ship in the wild under the same name). */
  private[sources] def inflate(enc: Array[Byte], gzip: Boolean,
      max: Long): (Array[Byte], String) = {
    var in: InputStream = null
    try {
      val bin = new java.io.ByteArrayInputStream(enc)
      // constructors validate headers and THROW on junk (GZIP magic
      // check happens in <init>) — they must sit inside this try
      in =
        if (gzip) new java.util.zip.GZIPInputStream(bin)
        else {
          // zlib wrapper: CMF low nibble 8 (deflate), FCHECK makes
          // the 16-bit header a multiple of 31
          val zlib = enc.length >= 2 && (enc(0) & 0x0f) == 8 &&
            ((((enc(0) & 0xff) << 8) | (enc(1) & 0xff)) % 31 == 0)
          new java.util.zip.InflaterInputStream(bin,
            new java.util.zip.Inflater(!zlib))
        }
      val out = new ByteArrayOutputStream(
        math.min(enc.length.toLong * 4, 1 << 16).toInt)
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) {
        if (out.size.toLong + n > max)
          return (null,
            s"oversize: inflated body exceeds cap $max, dropped")
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      (out.toByteArray, null)
    } catch {
      case e: java.io.IOException =>
        (null, s"${if (gzip) "gzip" else "deflate"}: ${
          e.getClass.getSimpleName}: ${
          Option(e.getMessage).getOrElse("").take(120)}")
    } finally if (in != null) in.close()
  }

  /** Payload bytes → string for text-bearing records (conversion
    * records, HTTP text bodies). */
  def payloadText(payload: Column): Column =
    decode(payload, "UTF-8")

  /** The declared charset of a Content-Type value (`text/html;
    * charset=ISO-8859-1` → `iso-8859-1`), lowercased; null when
    * absent. Row-local regex, codegen'd. */
  def charsetOf(contentType: Column): Column = {
    val cs = lower(regexp_extract(contentType,
      "(?i)charset\\s*=\\s*\"?([A-Za-z0-9_:.+-]+)", 1))
    when(cs === "" || cs.isNull, lit(null)).otherwise(cs)
  }

  /** Payload bytes → text honoring the DECLARED charset — real
    * crawls are not all UTF-8. Branch coverage is the crawl head:
    * `iso-8859-1`/`latin1` decode as Latin-1; `windows-1252`/
    * `cp1252` ALSO decode as Latin-1 (Spark's non-legacy decode
    * whitelist has no CP1252 codec; the two differ only on
    * 0x80–0x9F, which Latin-1 maps to C1 controls — a deterministic,
    * documented approximation, stripped by downstream whitespace
    * normalization when they appear where CP1252 meant punctuation);
    * `us-ascii` decodes as ASCII; the CJK head — `windows-31j`
    * (+ `cp932`/`ms932` — the JDK ships the exact MS932 codec, so
    * the vendor codepoints Shift_JIS lacks decode correctly),
    * `shift_jis` (+ `sjis`/`shift-jis`), `euc-kr`, `gbk` (+
    * `gb2312`, its strict subset — GBK decodes every GB2312 byte
    * pair identically and real "gb2312" pages are routinely GBK),
    * `big5` — decodes through the native [[graft.functions
    * .NativeExpressions.DecodeCharset]] JDK-charset expression (r19
    * verdict #5: these fell through to UTF-8 and garbled a visible
    * share of the real crawl); everything else — including an
    * absent header — falls back to UTF-8, the modern-web default.
    * Every branch's decode replaces malformed input with U+FFFD
    * (never throws); the charset column itself is one regex. */
  def payloadTextCs(payload: Column, contentType: Column): Column = {
    val cs = charsetOf(contentType)
    import graft.functions.NativeExpressions.decode_charset
    when(cs === "iso-8859-1" || cs === "latin1" || cs === "latin-1" ||
        cs === "windows-1252" || cs === "cp1252",
        decode(payload, "ISO-8859-1"))
      .when(cs === "us-ascii" || cs === "ascii",
        decode(payload, "US-ASCII"))
      .when(cs === "windows-31j" || cs === "cp932" || cs === "ms932",
        decode_charset(payload, "windows-31j"))
      .when(cs === "shift_jis" || cs === "shift-jis" ||
          cs === "sjis" || cs === "x-sjis",
        decode_charset(payload, "Shift_JIS"))
      .when(cs === "euc-kr" || cs === "euc_kr" || cs === "ks_c_5601-1987",
        decode_charset(payload, "EUC-KR"))
      .when(cs === "gbk" || cs === "gb2312" || cs === "gb_2312-80",
        decode_charset(payload, "GBK"))
      .when(cs === "big5" || cs === "big-5",
        decode_charset(payload, "Big5"))
      .otherwise(decode(payload, "UTF-8"))
  }

  /** Write a (uri, text) frame as WET conversion records — the
    * compact extracted-text artifact crawl pipelines hand downstream,
    * and this source's write half: a roundtrip through
    * [[readRecords]] restores every (uri, text, byte length). One
    * file per partition (the WARC parallelism contract in reverse —
    * size partitions to the ~1 GB file convention upstream), written
    * through the Hadoop FS so any scheme the session reaches works;
    * optional per-FILE gzip ([[readRecords]] inflates it by magic).
    *
    * `warcDate` is CALLER-SUPPLIED (stamp ingestion time at the
    * call site): a wall-clock default here would make re-runs
    * byte-unstable, and this engine's sinks are deterministic.
    * Bounded-export semantics: each task writes an ATTEMPT-UNIQUE
    * temp file and renames it into place on completion (r19 ADVICE:
    * creating the final name directly let two CONCURRENT attempts of
    * one partition — speculative execution, a zombie original beside
    * its retry — interleave writes into the same part file and ship
    * a corrupt WARC from an apparently successful job). The rename
    * is per-attempt atomic, so the final name only ever holds ONE
    * attempt's complete bytes — a racing loser either fails its
    * rename or whole-file-replaces with identical content (the input
    * partition is the same rows). There is no cross-file commit
    * protocol (export, not a transactional sink — the ClifSink/
    * commit-log machinery is the transactional path). */
  def writeWet(df: DataFrame, uriCol: String, textCol: String,
               outDir: String, warcDate: String,
               gzip: Boolean = false): Unit = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sessionState.newHadoopConf())
    val suffix = if (gzip) ".warc.gz" else ".warc"
    df.select(col(uriCol).cast("string"), col(textCol).cast("string"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val tc = org.apache.spark.TaskContext.get()
          val pid = tc.partitionId()
          val attempt = tc.taskAttemptId()
          val p = new org.apache.hadoop.fs.Path(outDir,
            f"part-$pid%05d$suffix")
          val tmp = new org.apache.hadoop.fs.Path(outDir,
            f".part-$pid%05d-attempt-$attempt$suffix.tmp")
          val fs = p.getFileSystem(conf.value)
          val raw = fs.create(tmp, true)
          val out: java.io.OutputStream =
            if (gzip) new java.util.zip.GZIPOutputStream(raw) else raw
          try {
            var i = 0L
            it.foreach { r =>
              val uri = Option(r.getString(0)).getOrElse("")
              val text = Option(r.getString(1)).getOrElse("")
              out.write(record(Seq(
                "WARC-Type" -> "conversion",
                "WARC-Record-ID" -> s"<urn:graft:wet:$pid:$i>",
                "WARC-Date" -> warcDate,
                "WARC-Target-URI" -> uri,
                "Content-Type" -> "text/plain"),
                text.getBytes("UTF-8")))
              i += 1
            }
          } finally out.close()
          // publish: replace any prior attempt's file whole (rename
          // onto an existing path fails on HDFS/local alike), then
          // rename — a lost race here means another attempt already
          // published identical content, so clean up and succeed
          if (fs.exists(p)) fs.delete(p, false)
          if (!fs.rename(tmp, p)) {
            fs.delete(tmp, false)
            if (!fs.exists(p)) throw new java.io.IOException(
              s"writeWet: rename $tmp -> $p failed with no " +
                "competing attempt's file in place")
          }
        }
      }
  }

  // ===== fixture writer (specs / staged oracle queries) =====

  /** Render one record. Content-Length is computed, not caller-set. */
  def record(headers: Seq[(String, String)],
             payload: Array[Byte]): Array[Byte] = {
    val h = new StringBuilder("WARC/1.0\r\n")
    headers.foreach { case (k, v) => h.append(s"$k: $v\r\n") }
    h.append(s"Content-Length: ${payload.length}\r\n\r\n")
    h.toString.getBytes("UTF-8") ++ payload ++ "\r\n\r\n".getBytes("UTF-8")
  }

  /** Concatenate records into one WARC file's bytes. */
  def writeWarc(records: Seq[Array[Byte]]): Array[Byte] =
    records.foldLeft(Array.emptyByteArray)(_ ++ _)

  // ===== streaming parser =====

  private def isGzip(in: BufferedInputStream): Boolean = {
    in.mark(2)
    val b0 = in.read(); val b1 = in.read()
    in.reset()
    b0 == 0x1f && b1 == 0x8b
  }

  /** Wrap `it` so the stream closes exactly once when the iterator
    * exhausts (flatMap never hands us a completion callback). */
  private def closeOnExhaust(it: Iterator[WarcRow],
                             in: InputStream): Iterator[WarcRow] =
    new Iterator[WarcRow] {
      private var closed = false
      def hasNext: Boolean = {
        val h = it.hasNext
        if (!h && !closed) { closed = true; in.close() }
        h
      }
      def next(): WarcRow = it.next()
    }

  /** Header/magic lines are short; 64 KiB is far past any real WARC
    * header yet small enough that resync through a multi-MB binary
    * blob stays O(1) memory (see [[readLine]]). */
  private val MaxLineBytes = 64 * 1024

  /** Read one header line: bytes to LF (CRLF tolerated and stripped,
    * bare LF tolerated — crawls contain both). None at EOF.
    *
    * Line length is CAPPED at [[MaxLineBytes]] (r19 ADVICE, medium):
    * the quarantine/resync path walks arbitrary junk through this —
    * a record with an understated Content-Length lands the parser
    * inside a large binary payload (image/gzip bytes with no
    * newlines), and an uncapped buffer would accumulate the rest of
    * the file in one ByteArrayOutputStream, defeating the documented
    * "memory bounded by one record's payload" contract on exactly
    * the dirty inputs the malformation policy targets. Past the cap
    * the overflow bytes are DISCARDED while the scan keeps consuming
    * to the next LF, so resync stays O(1) memory; the returned
    * truncated prefix is safe for both callers — seekMagic only
    * tests the LINE START for the record magic, and a >64 KiB
    * "header" line is crawl junk whose record is already bound for
    * the quarantine row. */
  private def readLine(in: InputStream): Option[String] = {
    val buf = new ByteArrayOutputStream(96)
    var b = in.read()
    if (b < 0) return None
    while (b >= 0 && b != '\n') {
      if (buf.size < MaxLineBytes) buf.write(b)
      b = in.read()
    }
    val s = buf.toString("UTF-8")
    Some(if (s.endsWith("\r")) s.dropRight(1) else s)
  }

  private def readFully(in: InputStream, n: Long,
                        keep: Int): (Array[Byte], Long) = {
    val out = new ByteArrayOutputStream(math.min(n, keep.toLong).toInt)
    var read = 0L
    val chunk = new Array[Byte](64 * 1024)
    while (read < n) {
      val want = math.min(chunk.length.toLong, n - read).toInt
      val got = in.read(chunk, 0, want)
      if (got < 0) throw new EOFException(
        s"payload truncated at $read of $n bytes")
      if (read < keep) out.write(chunk, 0,
        math.min(got.toLong, keep - read).toInt)
      read += got
    }
    (out.toByteArray, read)
  }

  /** Sequential record parse with quarantine + resync (object doc).
    * Lazy: one record is materialized at a time. */
  private[sources] def parseStream(in: InputStream, file: String,
      maxPayloadBytes: Long): Iterator[WarcRow] =
    new Iterator[WarcRow] {
      private var idx = 0L
      private var nextRow: Option[WarcRow] = fetch()

      private def headerMap(lines: Seq[String]): Map[String, String] =
        lines.flatMap { l =>
          val i = l.indexOf(':')
          if (i <= 0) None
          else Some(l.substring(0, i).trim.toLowerCase ->
            l.substring(i + 1).trim)
        }.toMap

      /** Skip blank/junk lines to the next `WARC/` magic; None at
        * EOF. Returns whether junk was skipped (resync happened). */
      private def seekMagic(): (Option[String], Boolean) = {
        var skipped = false
        var l = readLine(in)
        while (l.exists(s => !s.startsWith("WARC/"))) {
          if (l.exists(_.nonEmpty)) skipped = true
          l = readLine(in)
        }
        (l, skipped)
      }

      private def fetch(): Option[WarcRow] = {
        val (magic, resynced) = seekMagic()
        magic match {
          case None => None
          case Some(_) =>
            val i = idx; idx += 1
            // headers to the blank line (EOF mid-headers = truncated)
            val lines = Iterator.continually(readLine(in))
              .takeWhile(l => l.exists(_.nonEmpty))
              .flatten.toList
            val h = headerMap(lines)
            val cl = h.get("content-length").flatMap(s =>
              scala.util.Try(s.toLong).toOption)
            def row(payload: Array[Byte], malformed: Boolean,
                    err: String) = WarcRow(file, i,
              h.get("warc-type").orNull,
              h.get("warc-record-id").orNull,
              h.get("warc-target-uri").orNull,
              h.get("warc-date").orNull,
              h.get("content-type").orNull,
              cl.getOrElse(-1L), payload, malformed,
              Option(err).map(e =>
                if (resynced) s"resync; $e" else e)
                .getOrElse(if (resynced) "resync" else null),
              h.get("warc-payload-digest").orNull,
              h.get("warc-refers-to-target-uri").orNull)
            cl match {
              case None =>
                Some(row(null, malformed = true,
                  "missing/invalid Content-Length"))
              case Some(n) if n < 0 =>
                Some(row(null, malformed = true,
                  s"negative Content-Length $n"))
              case Some(n) =>
                try {
                  // maxPayloadBytes ≤ Int.MaxValue-8 is required at
                  // every entry point, so a kept payload always fits
                  // a JVM array exactly — no silent truncation path
                  val keep =
                    if (n > maxPayloadBytes) 0 else n.toInt
                  val (bytes, _) = readFully(in, n, keep)
                  if (n > maxPayloadBytes)
                    Some(row(null, malformed = false,
                      s"oversize: $n > cap $maxPayloadBytes, " +
                        "payload dropped"))
                  else Some(row(bytes, malformed = false, null))
                } catch {
                  case e: EOFException =>
                    Some(row(null, malformed = true, e.getMessage))
                }
            }
        }
      }

      def hasNext: Boolean = nextRow.isDefined
      def next(): WarcRow = {
        val r = nextRow.getOrElse(Iterator.empty.next())
        nextRow = fetch()
        r
      }
    }
}
