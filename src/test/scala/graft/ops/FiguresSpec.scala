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
