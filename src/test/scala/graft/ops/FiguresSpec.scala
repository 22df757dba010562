package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FiguresSpec extends SparkSpec {
  import spark.implicits._

  private def parseXml(svg: String): org.w3c.dom.Document = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(svg.getBytes("UTF-8")))
  }

  test("histogramFigure: Quality.histogram rows -> well-formed SVG, " +
    "one bar per bin, tallest bar spans the plot height") {
    val df = Seq.tabulate(100)(i => (i % 10) * 1.0).toDF("v")
    val hist = Quality.histogram(df, "v", binWidth = 2.0)
    val svg = Figures.histogramFigure(hist, "v <dist> & counts")
    val doc = parseXml(svg) // escaping + well-formedness
    assert(doc.getDocumentElement.getTagName == "svg")
    val bars = doc.getElementsByTagName("rect")
    assert(bars.getLength == hist.count()) // one bar per bin
    // equal-count bins -> all bars equal height = full plot height
    val hs = (0 until bars.getLength)
      .map(i => bars.item(i).getAttributes.getNamedItem("height")
        .getNodeValue.toDouble)
    assert(hs.distinct.size == 1 && hs.head > 100)
    // deterministic: same input -> identical bytes
    assert(svg == Figures.histogramFigure(
      Quality.histogram(df, "v", binWidth = 2.0), "v <dist> & counts"))
  }

  test("histogramFigurePng: valid byte-deterministic PNG, bars at the " +
    "bar color, background white, correct dimensions") {
    val df = Seq.tabulate(100)(i => (i % 10) * 1.0).toDF("v")
    val hist = Quality.histogram(df, "v", binWidth = 2.0)
    val png = Figures.histogramFigurePng(hist, "v dist & counts")
    // PNG signature
    assert(png.take(8).map(_ & 0xff).toSeq ==
      Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a))
    // chunk layout is exactly IHDR, IDAT, IEND (no metadata chunks)
    def tags(b: Array[Byte]): Seq[String] = {
      val bb = java.nio.ByteBuffer.wrap(b); bb.position(8)
      val out = Seq.newBuilder[String]
      while (bb.remaining() > 0) {
        val len = bb.getInt
        val tag = new String(Array.fill(4)(bb.get()), "US-ASCII")
        out += tag
        bb.position(bb.position() + len + 4) // data + crc
      }
      out.result()
    }
    assert(tags(png) == Seq("IHDR", "IDAT", "IEND"))
    // decodes (JDK reader validates CRCs + zlib stream)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 640 && img.getHeight == 360)
    // background corner white; a pixel inside the first bar is BarFill
    assert((img.getRGB(639, 0) & 0xffffff) == 0xffffff)
    // equal-count bins fill the whole plot band: x=padL+5, y mid-plot
    assert((img.getRGB(55, 180) & 0xffffff) == 0x4878a8)
    // deterministic: identical bytes on re-render
    val again = Figures.histogramFigurePng(
      Quality.histogram(df, "v", binWidth = 2.0), "v dist & counts")
    assert(java.util.Arrays.equals(png, again))
  }

  test("boxplotFigurePng: glyph geometry survives rasterization — " +
    "higher-valued group's box sits higher on the canvas") {
    val df = Seq.tabulate(300)(i =>
      (if (i % 3 == 0) "a" else "b", (i % 50) * 1.0 +
        (if (i % 3 == 0) 0 else 100))).toDF("g", "v")
    val stats = Quality.boxStats(df, "v", Seq("g"))
    val png = Figures.boxplotFigurePng(stats, "g", "per-group spread")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    // find the topmost BoxFill pixel in each glyph column band:
    // group a is the left glyph, group b the right (sorted order)
    def topBoxY(x: Int): Int = (0 until 360)
      .find(y => (img.getRGB(x, y) & 0xffffff) == 0xa8c8e8).getOrElse(-1)
    val (padL, plotW) = (50, 640 - 50 - 10)
    val aX = padL + plotW / 4      // center of left glyph
    val bX = padL + 3 * plotW / 4  // center of right glyph
    val (aTop, bTop) = (topBoxY(aX), topBoxY(bX))
    assert(aTop > 0 && bTop > 0, s"boxes not found: a=$aTop b=$bTop")
    // b sits 100 above a in value -> smaller y on canvas
    assert(bTop < aTop - 50, s"aTop=$aTop bTop=$bTop")
  }

  test("boxplotFigure: Quality.boxStats rows -> one glyph per group, " +
    "median band inside the box, labels present") {
    val df = Seq.tabulate(300)(i =>
      (if (i % 3 == 0) "a" else "b", (i % 50) * 1.0 +
        (if (i % 3 == 0) 0 else 100))).toDF("g", "v")
    val stats = Quality.boxStats(df, "v", Seq("g"))
    val svg = Figures.boxplotFigure(stats, "g", "per-group spread")
    val doc = parseXml(svg)
    assert(doc.getElementsByTagName("g").getLength == 2) // one per group
    assert(svg.contains(">a</text>") && svg.contains(">b</text>"))
    // group b sits 100 above group a: its box (q3) must render HIGHER
    // value -> smaller y in svg space
    val rects = doc.getElementsByTagName("rect")
    val ys = (0 until rects.getLength).map(i =>
      rects.item(i).getAttributes.getNamedItem("y").getNodeValue.toDouble)
    assert(ys.size == 2 && ys.max - ys.min > 50)
  }
}
