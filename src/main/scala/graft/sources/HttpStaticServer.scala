package graft.sources

import java.net.InetSocketAddress
import java.util.{Collections, List => JList}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Loopback static-object server with object-store semantics — the dev
  * fixture for exercising [[HttpFs]] end-to-end without egress: HEAD
  * answers Content-Length, GET honors `Range: bytes=a-b` (RFC 9110)
  * with 206/Content-Range, and every request is logged as
  * (method, rangeHeader|null) so callers can assert the access
  * pattern (UriSourceSpec pins that parquet reads seek via ranged
  * GETs). Serves ONE in-memory object on an OS-assigned port; used by
  * the `s9_http_scan` oracle query and the source specs. Not a
  * production server — the production path is any HTTP endpoint that
  * provides Content-Length and Range. */
object HttpStaticServer {

  final class Handle private[HttpStaticServer] (
      val uri: String,
      val log: JList[(String, String)],
      server: HttpServer) {
    def stop(): Unit = server.stop(0)
  }

  def serve(path: String, body: Array[Byte]): Handle = {
    val log = Collections.synchronizedList(
      new java.util.ArrayList[(String, String)]())
    val server = HttpServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext(path, (ex: HttpExchange) => {
      val range = ex.getRequestHeaders.getFirst("Range")
      log.add((ex.getRequestMethod, range))
      try ex.getRequestMethod match {
        case "HEAD" =>
          // explicit header + responseLength −1: jdk's HttpServer then
          // sends the length without expecting a body write
          ex.getResponseHeaders.set("Content-Length",
            String.valueOf(body.length))
          ex.sendResponseHeaders(200, -1)
        case _ =>
          // suffix ranges (bytes=-N, some parquet footer readers) are
          // honored; any other unparseable Range falls back to a full
          // 200 (allowed by RFC 9110 — a server MAY ignore Range)
          // rather than NPEing the handler into a dropped connection
          val parsed = Option(range).flatMap { r =>
            "bytes=(\\d+)-(\\d*)".r.findFirstMatchIn(r).map { m =>
              val lo = m.group(1).toLong
              val hi = if (m.group(2).isEmpty) body.length - 1L
                       else math.min(m.group(2).toLong, body.length - 1L)
              (lo, hi)
            }.orElse("bytes=-(\\d+)".r.findFirstMatchIn(r).map { m =>
              val n = math.min(m.group(1).toLong, body.length.toLong)
              (body.length - n, body.length - 1L)
            })
          }
          parsed match {
            case Some((lo, hi)) if lo <= hi && lo < body.length =>
              val slice = java.util.Arrays.copyOfRange(
                body, lo.toInt, hi.toInt + 1)
              ex.getResponseHeaders.set("Content-Range",
                s"bytes $lo-$hi/${body.length}")
              ex.sendResponseHeaders(206, slice.length.toLong)
              ex.getResponseBody.write(slice)
            case _ =>
              ex.sendResponseHeaders(200, body.length.toLong)
              ex.getResponseBody.write(body)
          }
      } finally ex.close()
    })
    // start from a short-lived daemon thread: the jdk server's
    // HTTP-Dispatcher thread inherits daemon status from its creator,
    // and a NON-daemon dispatcher pins the JVM open after main returns
    // (the exit-time shutdown hook that would stop the server then
    // never fires — observed as a wedged Verify run)
    val starter = new Thread(() => server.start(), "http-static-starter")
    starter.setDaemon(true)
    starter.start()
    starter.join()
    new Handle(
      s"http://127.0.0.1:${server.getAddress.getPort}$path", log, server)
  }
}
