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
  * Output is self-contained SVG (text, deterministic, diffable in
  * review, viewable anywhere) rather than a raster — no plotting
  * library exists in the offline dependency set, and none is needed
  * to draw rectangles.
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
