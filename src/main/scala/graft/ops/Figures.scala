package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** QC figure rendering (the reference's ggplot output surface —
  * `code/RCLIF_vitals.Rmd:255-278` emits per-vital histograms and
  * boxplots as .png artifacts next to the data).
  *
  * The engine keeps the SPLIT the reference's workflow implies but
  * ggplot hides: the distributed part is the aggregation
  * ([[Quality.histogram]] / [[Quality.boxStats]] — groups-sized
  * results), and figure rendering is a driver-side walk over those
  * already-bounded rows, exactly like ggplot over an aggregated frame.
  * Output comes in both the formats the workflow wants: self-contained
  * SVG (text, deterministic, diffable in review) and raster PNG
  * matching the reference's .png artifacts — both produced with zero
  * plotting/imaging dependencies (the PNG path rasterizes the same
  * geometry into a pixel buffer and byte-encodes it directly), and
  * both byte-deterministic for identical input.
  *
  * Scale contract: inputs must be CHART-shaped (bins × groups, not
  * raw rows). Both entry points take the OUTPUT of the Quality
  * aggregations, so the collect here is bounded by bin/group
  * cardinality by construction — the corpus never reaches the driver.
  */
object Figures {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def fmt(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
    else f"$d%.6g"

  /** Render [[Quality.histogram]] rows (bin_lo, bin_hi, n) as an SVG
    * bar chart. Missing bins render as gaps (zero-height), matching
    * the aggregation's sparse output. */
  def histogramSvg(bins: Seq[(Double, Double, Long)], title: String,
                   width: Int = 640, height: Int = 360): String = {
    require(bins.nonEmpty, "histogramSvg: no bins")
    val sorted = bins.sortBy(_._1)
    val (padL, padB, padT) = (50, 30, 24)
    val plotW = width - padL - 10
    val plotH = height - padT - padB
    val lo = sorted.head._1
    val hi = sorted.last._2
    val maxN = sorted.map(_._3).max.max(1L)
    def x(v: Double): Double = padL + (v - lo) / (hi - lo) * plotW
    def y(n: Long): Double = padT + plotH - n.toDouble / maxN * plotH
    val bars = sorted.map { case (bLo, bHi, n) =>
      val w = math.max(x(bHi) - x(bLo) - 1, 1.0)
      s"""<rect x="${fmt(x(bLo))}" y="${fmt(y(n))}" width="${fmt(w)}" """ +
        s"""height="${fmt(padT + plotH - y(n))}" fill="#4878a8">""" +
        s"""<title>[${fmt(bLo)}, ${fmt(bHi)}): $n</title></rect>"""
    }.mkString
    val axis =
      s"""<line x1="$padL" y1="${padT + plotH}" x2="${padL + plotW}" """ +
        s"""y2="${padT + plotH}" stroke="black"/>""" +
        s"""<line x1="$padL" y1="$padT" x2="$padL" y2="${padT + plotH}" """ +
        """stroke="black"/>""" +
        s"""<text x="$padL" y="${height - 8}" font-size="11">${fmt(lo)}</text>""" +
        s"""<text x="${padL + plotW - 30}" y="${height - 8}" font-size="11">${fmt(hi)}</text>""" +
        s"""<text x="4" y="${padT + 4}" font-size="11">$maxN</text>""" +
        s"""<text x="4" y="${padT + plotH}" font-size="11">0</text>"""
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" """ +
      s"""height="$height" viewBox="0 0 $width $height">""" +
      s"""<text x="${width / 2}" y="15" text-anchor="middle" """ +
      s"""font-size="13">${esc(title)}</text>$axis$bars</svg>"""
  }

  /** Render [[Quality.boxStats]] rows as side-by-side box-and-whisker
    * glyphs (box = q1..q3, band = median, whiskers = Tukey fences
    * clamped to observed min/max — ggplot's geom_boxplot convention). */
  def boxplotSvg(stats: Seq[(String, Double, Double, Double, Double,
                   Double, Double, Double)], title: String,
                 width: Int = 640, height: Int = 360): String = {
    require(stats.nonEmpty, "boxplotSvg: no groups")
    val (padL, padB, padT) = (50, 40, 24)
    val plotW = width - padL - 10
    val plotH = height - padT - padB
    val lo = stats.map(_._2).min
    val hi = stats.map(_._6).max
    val span = if (hi > lo) hi - lo else 1.0
    def y(v: Double): Double = padT + plotH - (v - lo) / span * plotH
    val bw = plotW / stats.size
    val glyphs = stats.sortBy(_._1).zipWithIndex.map {
      case ((g, minV, q1, med, q3, maxV, loW, hiW), i) =>
        val cx = padL + bw * i + bw / 2.0
        val half = math.min(bw * 0.3, 40.0)
        val wLo = math.max(loW, minV) // clamp fences to observed range
        val wHi = math.min(hiW, maxV)
        s"""<g><line x1="${fmt(cx)}" y1="${fmt(y(wLo))}" x2="${fmt(cx)}" """ +
          s"""y2="${fmt(y(wHi))}" stroke="black"/>""" +
          s"""<rect x="${fmt(cx - half)}" y="${fmt(y(q3))}" """ +
          s"""width="${fmt(half * 2)}" height="${fmt(y(q1) - y(q3))}" """ +
          """fill="#a8c8e8" stroke="black">""" +
          s"""<title>$g: q1=${fmt(q1)} med=${fmt(med)} q3=${fmt(q3)}</title></rect>""" +
          s"""<line x1="${fmt(cx - half)}" y1="${fmt(y(med))}" """ +
          s"""x2="${fmt(cx + half)}" y2="${fmt(y(med))}" stroke="black" stroke-width="2"/>""" +
          s"""<text x="${fmt(cx)}" y="${height - 8}" text-anchor="middle" """ +
          s"""font-size="11">${esc(g)}</text></g>"""
    }.mkString
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" """ +
      s"""height="$height" viewBox="0 0 $width $height">""" +
      s"""<text x="${width / 2}" y="15" text-anchor="middle" """ +
      s"""font-size="13">${esc(title)}</text>$glyphs</svg>"""
  }

  // ------------------------------------------------------------------
  // Raster (PNG) output — the reference's figure artifacts are ggplot
  // .png files (`code/RCLIF_vitals.Rmd:255-278`); the SVG path above
  // is data-identical but format-different. This path closes that gap
  // with zero dependencies: geometry is rasterized into a plain RGB
  // pixel buffer (no AWT fonts / fontconfig — headless containers
  // often lack both), text uses an embedded 5x7 bitmap font, and the
  // encoder writes exactly IHDR+IDAT+IEND (fixed deflate level, no
  // tIME/tEXt metadata) so identical input yields identical BYTES on
  // any platform — same determinism contract the SVG path has.
  // ------------------------------------------------------------------

  private val BarFill = 0x4878a8
  private val BoxFill = 0xa8c8e8
  private val Black = 0x000000
  private val White = 0xffffff

  /** Fixed-layout raster surface; (0,0) top-left, like SVG space. */
  private final class Canvas(val w: Int, val h: Int) {
    val px: Array[Int] = Array.fill(w * h)(White)
    def set(x: Int, y: Int, rgb: Int): Unit =
      if (x >= 0 && x < w && y >= 0 && y < h) px(y * w + x) = rgb
    def fillRect(x0: Double, y0: Double, rw: Double, rh: Double,
                 rgb: Int): Unit = {
      val xa = math.max(0, math.rint(x0).toInt)
      val ya = math.max(0, math.rint(y0).toInt)
      val xb = math.min(w - 1, math.rint(x0 + rw).toInt - 1)
      val yb = math.min(h - 1, math.rint(y0 + rh).toInt - 1)
      var y = ya
      while (y <= yb) { var x = xa
        while (x <= xb) { px(y * w + x) = rgb; x += 1 }; y += 1 }
    }
    def hline(x0: Double, x1: Double, y: Double, rgb: Int): Unit =
      fillRect(math.min(x0, x1), y, math.abs(x1 - x0) + 1, 1, rgb)
    def vline(x: Double, y0: Double, y1: Double, rgb: Int): Unit =
      fillRect(x, math.min(y0, y1), 1, math.abs(y1 - y0) + 1, rgb)
    def frameRect(x0: Double, y0: Double, rw: Double, rh: Double,
                  rgb: Int): Unit = {
      hline(x0, x0 + rw - 1, y0, rgb); hline(x0, x0 + rw - 1, y0 + rh - 1, rgb)
      vline(x0, y0, y0 + rh - 1, rgb); vline(x0 + rw - 1, y0, y0 + rh - 1, rgb)
    }
    /** 5x7 glyphs, 6px advance; `y` is the glyph TOP. Unmapped chars
      * advance silently (lowercase is folded to upper first). */
    def text(x0: Double, y0: Double, s: String, rgb: Int): Unit = {
      var cx = math.rint(x0).toInt
      val cy = math.rint(y0).toInt
      s.toUpperCase.foreach { c =>
        Glyphs.get(c).foreach { rows =>
          var r = 0
          while (r < 7) { var b = 0
            while (b < 5) {
              if ((rows(r) & (1 << (4 - b))) != 0) set(cx + b, cy + r, rgb)
              b += 1 }
            r += 1 }
        }
        cx += 6
      }
    }
    def textCentered(cx: Double, y0: Double, s: String, rgb: Int): Unit =
      text(cx - s.length * 6 / 2.0, y0, s, rgb)
  }

  /** 5x7 bitmap font (classic HD44780-style dot patterns, public
    * domain shapes), bit 4 = leftmost column. Digits, A-Z, and the
    * punctuation the axis labels / titles use. */
  private val Glyphs: Map[Char, Array[Int]] = Map(
    '0' -> Array(0x0e, 0x11, 0x13, 0x15, 0x19, 0x11, 0x0e),
    '1' -> Array(0x04, 0x0c, 0x04, 0x04, 0x04, 0x04, 0x0e),
    '2' -> Array(0x0e, 0x11, 0x01, 0x02, 0x04, 0x08, 0x1f),
    '3' -> Array(0x1f, 0x02, 0x04, 0x02, 0x01, 0x11, 0x0e),
    '4' -> Array(0x02, 0x06, 0x0a, 0x12, 0x1f, 0x02, 0x02),
    '5' -> Array(0x1f, 0x10, 0x1e, 0x01, 0x01, 0x11, 0x0e),
    '6' -> Array(0x06, 0x08, 0x10, 0x1e, 0x11, 0x11, 0x0e),
    '7' -> Array(0x1f, 0x01, 0x02, 0x04, 0x08, 0x08, 0x08),
    '8' -> Array(0x0e, 0x11, 0x11, 0x0e, 0x11, 0x11, 0x0e),
    '9' -> Array(0x0e, 0x11, 0x11, 0x0f, 0x01, 0x02, 0x0c),
    'A' -> Array(0x0e, 0x11, 0x11, 0x1f, 0x11, 0x11, 0x11),
    'B' -> Array(0x1e, 0x11, 0x11, 0x1e, 0x11, 0x11, 0x1e),
    'C' -> Array(0x0e, 0x11, 0x10, 0x10, 0x10, 0x11, 0x0e),
    'D' -> Array(0x1c, 0x12, 0x11, 0x11, 0x11, 0x12, 0x1c),
    'E' -> Array(0x1f, 0x10, 0x10, 0x1e, 0x10, 0x10, 0x1f),
    'F' -> Array(0x1f, 0x10, 0x10, 0x1e, 0x10, 0x10, 0x10),
    'G' -> Array(0x0e, 0x11, 0x10, 0x17, 0x11, 0x11, 0x0f),
    'H' -> Array(0x11, 0x11, 0x11, 0x1f, 0x11, 0x11, 0x11),
    'I' -> Array(0x0e, 0x04, 0x04, 0x04, 0x04, 0x04, 0x0e),
    'J' -> Array(0x07, 0x02, 0x02, 0x02, 0x02, 0x12, 0x0c),
    'K' -> Array(0x11, 0x12, 0x14, 0x18, 0x14, 0x12, 0x11),
    'L' -> Array(0x10, 0x10, 0x10, 0x10, 0x10, 0x10, 0x1f),
    'M' -> Array(0x11, 0x1b, 0x15, 0x15, 0x11, 0x11, 0x11),
    'N' -> Array(0x11, 0x11, 0x19, 0x15, 0x13, 0x11, 0x11),
    'O' -> Array(0x0e, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0e),
    'P' -> Array(0x1e, 0x11, 0x11, 0x1e, 0x10, 0x10, 0x10),
    'Q' -> Array(0x0e, 0x11, 0x11, 0x11, 0x15, 0x12, 0x0d),
    'R' -> Array(0x1e, 0x11, 0x11, 0x1e, 0x14, 0x12, 0x11),
    'S' -> Array(0x0f, 0x10, 0x10, 0x0e, 0x01, 0x01, 0x1e),
    'T' -> Array(0x1f, 0x04, 0x04, 0x04, 0x04, 0x04, 0x04),
    'U' -> Array(0x11, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0e),
    'V' -> Array(0x11, 0x11, 0x11, 0x11, 0x11, 0x0a, 0x04),
    'W' -> Array(0x11, 0x11, 0x11, 0x15, 0x15, 0x15, 0x0a),
    'X' -> Array(0x11, 0x11, 0x0a, 0x04, 0x0a, 0x11, 0x11),
    'Y' -> Array(0x11, 0x11, 0x0a, 0x04, 0x04, 0x04, 0x04),
    'Z' -> Array(0x1f, 0x01, 0x02, 0x04, 0x08, 0x10, 0x1f),
    '-' -> Array(0x00, 0x00, 0x00, 0x0e, 0x00, 0x00, 0x00),
    '+' -> Array(0x00, 0x04, 0x04, 0x1f, 0x04, 0x04, 0x00),
    '.' -> Array(0x00, 0x00, 0x00, 0x00, 0x00, 0x0c, 0x0c),
    ',' -> Array(0x00, 0x00, 0x00, 0x00, 0x0c, 0x04, 0x08),
    ':' -> Array(0x00, 0x0c, 0x0c, 0x00, 0x0c, 0x0c, 0x00),
    '(' -> Array(0x02, 0x04, 0x08, 0x08, 0x08, 0x04, 0x02),
    ')' -> Array(0x08, 0x04, 0x02, 0x02, 0x02, 0x04, 0x08),
    '[' -> Array(0x0e, 0x08, 0x08, 0x08, 0x08, 0x08, 0x0e),
    ']' -> Array(0x0e, 0x02, 0x02, 0x02, 0x02, 0x02, 0x0e),
    '%' -> Array(0x19, 0x19, 0x02, 0x04, 0x08, 0x13, 0x13),
    '/' -> Array(0x01, 0x01, 0x02, 0x04, 0x08, 0x10, 0x10),
    '_' -> Array(0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x1f),
    '<' -> Array(0x02, 0x04, 0x08, 0x10, 0x08, 0x04, 0x02),
    '>' -> Array(0x08, 0x04, 0x02, 0x01, 0x02, 0x04, 0x08),
    '&' -> Array(0x08, 0x14, 0x14, 0x08, 0x15, 0x12, 0x0d),
    '=' -> Array(0x00, 0x00, 0x1f, 0x00, 0x1f, 0x00, 0x00),
    ' ' -> Array(0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00))

  /** Minimal PNG encoder: 8-bit RGB (color type 2), filter 0, one
    * IDAT, fixed deflate level — exactly three chunks, no metadata,
    * so output bytes are a pure function of the pixels. */
  private def encodePng(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    def be(v: Int): Array[Byte] = Array((v >>> 24).toByte,
      (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(tag: String, data: Array[Byte]): Unit = {
      out.write(be(data.length))
      val body = tag.getBytes("US-ASCII") ++ data
      out.write(body)
      val c = new java.util.zip.CRC32(); c.update(body)
      out.write(be(c.getValue.toInt))
    }
    chunk("IHDR", be(w) ++ be(h) ++ Array[Byte](8, 2, 0, 0, 0))
    val raw = new Array[Byte](h * (1 + 3 * w))
    var y = 0
    while (y < h) {
      val base = y * (1 + 3 * w) // raw(base) = 0: filter None
      var x = 0
      while (x < w) {
        val p = px(y * w + x)
        raw(base + 1 + 3 * x) = (p >>> 16).toByte
        raw(base + 2 + 3 * x) = (p >>> 8).toByte
        raw(base + 3 + 3 * x) = p.toByte
        x += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater(6) // fixed level: stable bytes
    defl.setInput(raw); defl.finish()
    val zipped = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) zipped.write(buf, 0, defl.deflate(buf))
    defl.end()
    chunk("IDAT", zipped.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** [[histogramSvg]]'s geometry rasterized to PNG bytes — same
    * layout constants, same data mapping, raster instead of markup. */
  def histogramPng(bins: Seq[(Double, Double, Long)], title: String,
                   width: Int = 640, height: Int = 360): Array[Byte] = {
    require(bins.nonEmpty, "histogramPng: no bins")
    val sorted = bins.sortBy(_._1)
    val (padL, padB, padT) = (50, 30, 24)
    val plotW = width - padL - 10
    val plotH = height - padT - padB
    val lo = sorted.head._1
    val hi = sorted.last._2
    val maxN = sorted.map(_._3).max.max(1L)
    def x(v: Double): Double = padL + (v - lo) / (hi - lo) * plotW
    def y(n: Long): Double = padT + plotH - n.toDouble / maxN * plotH
    val c = new Canvas(width, height)
    sorted.foreach { case (bLo, bHi, n) =>
      val w = math.max(x(bHi) - x(bLo) - 1, 1.0)
      c.fillRect(x(bLo), y(n), w, padT + plotH - y(n), BarFill)
    }
    c.hline(padL, padL + plotW, padT + plotH, Black)
    c.vline(padL, padT, padT + plotH, Black)
    c.text(padL, height - 16, fmt(lo), Black)
    c.text(padL + plotW - 30, height - 16, fmt(hi), Black)
    c.text(4, padT - 3, maxN.toString, Black)
    c.text(4, padT + plotH - 7, "0", Black)
    c.textCentered(width / 2.0, 8, title, Black)
    encodePng(width, height, c.px)
  }

  /** [[boxplotSvg]]'s geometry rasterized to PNG bytes. */
  def boxplotPng(stats: Seq[(String, Double, Double, Double, Double,
                   Double, Double, Double)], title: String,
                 width: Int = 640, height: Int = 360): Array[Byte] = {
    require(stats.nonEmpty, "boxplotPng: no groups")
    val (padL, padB, padT) = (50, 40, 24)
    val plotW = width - padL - 10
    val plotH = height - padT - padB
    val lo = stats.map(_._2).min
    val hi = stats.map(_._6).max
    val span = if (hi > lo) hi - lo else 1.0
    def y(v: Double): Double = padT + plotH - (v - lo) / span * plotH
    val bw = plotW / stats.size
    val c = new Canvas(width, height)
    stats.sortBy(_._1).zipWithIndex.foreach {
      case ((g, minV, q1, med, q3, maxV, loW, hiW), i) =>
        val cx = padL + bw * i + bw / 2.0
        val half = math.min(bw * 0.3, 40.0)
        val wLo = math.max(loW, minV)
        val wHi = math.min(hiW, maxV)
        c.vline(cx, y(wLo), y(wHi), Black)
        c.fillRect(cx - half, y(q3), half * 2, y(q1) - y(q3), BoxFill)
        c.frameRect(cx - half, y(q3), half * 2,
          math.max(y(q1) - y(q3), 1.0), Black)
        c.fillRect(cx - half, y(med) - 1, half * 2, 2, Black)
        c.textCentered(cx, height - 16, g, Black)
    }
    c.textCentered(width / 2.0, 8, title, Black)
    encodePng(width, height, c.px)
  }

  /** [[Quality.histogram]] output -> PNG bytes (bounded collect). */
  def histogramFigurePng(histRows: DataFrame, title: String): Array[Byte] = {
    val rows = histRows.select(col("bin_lo").cast("double"),
      col("bin_hi").cast("double"), col("n").cast("long")).collect()
    histogramPng(rows.toSeq.map(r =>
      (r.getDouble(0), r.getDouble(1), r.getLong(2))), title)
  }

  /** [[Quality.boxStats]] output -> PNG bytes (bounded collect). */
  def boxplotFigurePng(statRows: DataFrame, groupCol: String,
                       title: String): Array[Byte] = {
    def d(r: Row, n: String): Double =
      r.getAs[Any](n) match {
        case x: java.lang.Number => x.doubleValue()
        case other => other.toString.toDouble
      }
    val rows = statRows.collect().toSeq.map { r =>
      (r.getAs[Any](groupCol).toString, d(r, "min_v"), d(r, "q1"),
        d(r, "median"), d(r, "q3"), d(r, "max_v"),
        d(r, "lo_whisker"), d(r, "hi_whisker"))
    }
    boxplotPng(rows, title)
  }

  /** [[Quality.histogram]] output -> SVG (bounded collect: bins). */
  def histogramFigure(histRows: DataFrame, title: String): String = {
    val rows = histRows.select(col("bin_lo").cast("double"),
      col("bin_hi").cast("double"), col("n").cast("long")).collect()
    histogramSvg(rows.toSeq.map(r =>
      (r.getDouble(0), r.getDouble(1), r.getLong(2))), title)
  }

  /** [[Quality.boxStats]] output -> SVG, one glyph per group (bounded
    * collect: groups). `groupCol` is rendered as the x label. */
  def boxplotFigure(statRows: DataFrame, groupCol: String,
                    title: String): String = {
    def d(r: Row, n: String): Double =
      r.getAs[Any](n) match {
        case x: java.lang.Number => x.doubleValue()
        case other => other.toString.toDouble
      }
    val rows = statRows.collect().toSeq.map { r =>
      (r.getAs[Any](groupCol).toString, d(r, "min_v"), d(r, "q1"),
        d(r, "median"), d(r, "q3"), d(r, "max_v"),
        d(r, "lo_whisker"), d(r, "hi_whisker"))
    }
    boxplotSvg(rows, title)
  }
}
