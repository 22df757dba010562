package graft.sources

import java.io.{EOFException, IOException, InputStream}
import java.net.{HttpURLConnection, URI, URL}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSInputStream, FileStatus, Path}
import org.apache.hadoop.fs.http.{HttpFileSystem, HttpsFileSystem}
import org.apache.spark.sql.SparkSession

/** Read-capable `http(s)://` Hadoop filesystem: makes any plain HTTP
  * endpoint a first-class Spark read source through the SAME
  * scheme-dispatch path the object stores use (SURVEY.md §2.1 S3 — the
  * reference pulls remote extracts through a bespoke Box client,
  * `code/RCLIF_dialysis.Rmd:25-32`; here the remote store is just a URI).
  *
  * Hadoop ships `org.apache.hadoop.fs.http.HttpFileSystem` (read-only,
  * HADOOP-14383) but it is distcp-grade: `getFileStatus` hardcodes
  * length −1, `listStatus` throws, and `open` cannot seek — so Spark's
  * file index refuses it and split planning would be impossible anyway.
  * These subclasses add exactly the three capabilities Spark's scan
  * path needs, all with standard HTTP/1.1 semantics:
  *
  *  - `getFileStatus`: HEAD request, length = Content-Length (the
  *    endpoint must provide it — S3/GCS/static file servers do);
  *  - `listStatus(file)`: the single file's status (an http URL has no
  *    directory listing; globs/directories are rejected loudly);
  *  - `open`: a seekable stream backed by `Range: bytes=pos-` requests
  *    (RFC 9110 §14.2), so a multi-split read of a large object seeks
  *    straight to its split offset — the same parallel-range pattern
  *    s3a uses — and `PositionedReadable` side-reads open independent
  *    bounded-range connections without disturbing the main stream.
  *
  * Scale contract: one HEAD per status call, one GET per split/seek; no
  * listing amplification is possible (no directories exist). Servers
  * that ignore Range (respond 200 from byte 0) are handled by skipping
  * forward, correct but linear — fine for the header sniff Spark does
  * at offset 0, pathological for deep seeks; such servers should be
  * fronted by a range-capable proxy for split reads (documented, not
  * guessed: the stream checks the response code).
  *
  * Install with [[HttpFs.install]] (sets `fs.http.impl`/`fs.https.impl`
  * on the session's Hadoop conf), then `UriSource.read/delimited` with
  * an `http(s)://` URI just works. Proven end-to-end against a live
  * loopback server in UriSourceSpec, including a forced 3-split read
  * whose per-split Range requests are asserted server-side.
  */
class GraftHttpFileSystem extends HttpFileSystem {
  override def getFileStatus(f: Path): FileStatus =
    HttpFs.headStatus(this.makeQualified(f))
  override def listStatus(f: Path): Array[FileStatus] =
    Array(getFileStatus(f))
  override def open(f: Path, bufferSize: Int): FSDataInputStream =
    HttpFs.openSeekable(this.makeQualified(f))
}

class GraftHttpsFileSystem extends HttpsFileSystem {
  override def getFileStatus(f: Path): FileStatus =
    HttpFs.headStatus(this.makeQualified(f))
  override def listStatus(f: Path): Array[FileStatus] =
    Array(getFileStatus(f))
  override def open(f: Path, bufferSize: Int): FSDataInputStream =
    HttpFs.openSeekable(this.makeQualified(f))
}

object HttpFs {

  /** Point this session's `http://`/`https://` URIs at the graft
    * filesystems. Idempotent; affects only the session's Hadoop conf. */
  def install(spark: SparkSession): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.http.impl", classOf[GraftHttpFileSystem].getName)
    conf.set("fs.https.impl", classOf[GraftHttpsFileSystem].getName)
    // statuses are immutable (no mtime from HEAD): per-scheme FS cache
    // stays valid; nothing else to configure
  }

  private def connect(u: URL, method: String,
                      range: Option[String]): HttpURLConnection = {
    val c = u.openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod(method)
    c.setInstanceFollowRedirects(true)
    range.foreach(r => c.setRequestProperty("Range", r))
    c
  }

  private[sources] def headStatus(qualified: Path): FileStatus = {
    val c = connect(qualified.toUri.toURL, "HEAD", None)
    try {
      val code = c.getResponseCode
      if (code >= 400)
        throw new IOException(s"HEAD $qualified -> HTTP $code")
      val len = c.getContentLengthLong
      if (len < 0)
        throw new IOException(
          s"HEAD $qualified returned no Content-Length; split planning " +
            "needs the object size (serve with a length or stage the file)")
      new FileStatus(len, false, 1, 4096L, 0L, qualified)
    } finally c.disconnect()
  }

  private[sources] def openSeekable(qualified: Path): FSDataInputStream =
    new FSDataInputStream(new HttpRangeInputStream(qualified.toUri))

  /** Seekable/positioned-readable HTTP stream. The main cursor holds at
    * most ONE live connection; seek closes it and the next read opens
    * `Range: bytes=pos-`. Positioned side-reads use their own bounded
    * `bytes=pos-(pos+len-1)` connections. A server that ignores Range
    * (200 from byte 0) is detected from the response code and handled
    * by skipping forward — correct, linear, documented. */
  private final class HttpRangeInputStream(uri: URI) extends FSInputStream {
    private var pos = 0L
    private var in: InputStream = _

    private def ensureOpen(): InputStream = {
      if (in == null) {
        val range = if (pos == 0) None else Some(s"bytes=$pos-")
        val c = connect(uri.toURL, "GET", range)
        val code = c.getResponseCode
        if (code >= 400) throw new IOException(s"GET $uri -> HTTP $code")
        val s = c.getInputStream
        // 206 = ranged as asked; 200 = server ignored Range: skip forward
        if (pos > 0 && code == 200) {
          var left = pos
          val scratch = new Array[Byte](8192)
          while (left > 0) {
            val n = s.skip(left)
            if (n > 0) left -= n
            else {
              // skip() may return 0 without being at EOF (InputStream
              // contract) — only read() distinguishes the two
              val r = s.read(scratch, 0,
                math.min(left, scratch.length.toLong).toInt)
              if (r < 0) throw new EOFException(
                s"$uri shorter than seek position $pos")
              left -= r
            }
          }
        }
        in = s
      }
      in
    }

    override def seek(newPos: Long): Unit = if (newPos != pos) {
      if (in != null) { in.close(); in = null }
      pos = newPos
    }

    override def getPos: Long = pos

    override def seekToNewSource(targetPos: Long): Boolean = false

    override def read(): Int = {
      val b = ensureOpen().read()
      if (b >= 0) pos += 1
      b
    }

    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      val n = ensureOpen().read(b, off, len)
      if (n > 0) pos += n
      n
    }

    /** Bounded side-read on an independent connection (does not move
      * the main cursor) — parquet footer/page reads take this path. */
    override def read(position: Long, buffer: Array[Byte], offset: Int,
                      length: Int): Int = {
      if (length == 0) return 0
      val c = connect(uri.toURL, "GET",
        Some(s"bytes=$position-${position + length - 1}"))
      try {
        val code = c.getResponseCode
        if (code >= 400) throw new IOException(s"GET $uri -> HTTP $code")
        val s = c.getInputStream
        try {
          if (code == 200) { // Range ignored: skip to position
            var left = position
            while (left > 0) {
              val n = s.skip(left)
              if (n <= 0) return -1
              left -= n
            }
          }
          var total = 0
          var n = 0
          while (total < length && n >= 0) {
            n = s.read(buffer, offset + total, length - total)
            if (n > 0) total += n
          }
          if (total == 0) -1 else total
        } finally s.close()
      } finally c.disconnect()
    }

    override def close(): Unit = {
      if (in != null) { in.close(); in = null }
      super.close()
    }
  }
}
