package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import java.io.ByteArrayInputStream
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/** Native `.xlsx` ingestion (SURVEY.md §2.1 S2) — pure JDK, no POI.
  *
  * The reference reads its vocabulary sheets directly from Excel
  * workbooks (`code/RCLIF_vitals.Rmd:33,93`, `code/RCLIF_labs.Rmd:38`:
  * `read_excel(...)`); spark-excel is not in the offline dependency
  * set, but an xlsx is only a ZIP of small XML parts
  * ([Content_Types], workbook.xml → sheet name/rId, workbook.xml.rels
  * → rId/part path, sharedStrings.xml, worksheets/sheetN.xml), all
  * parseable with `java.util.zip` + StAX from the JDK. This closes the
  * "content-complete but needs out-of-band conversion" gap: a user can
  * point the engine at a NEW workbook without any conversion step.
  *
  * Two entry points matching the two scales xlsx shows up at:
  *  - [[readSheet]]: ONE workbook, parsed on the driver — the
  *    vocab-contract case (sheets are dimension-sized by definition;
  *    the reference's largest is 45 rows). Resolved through the Hadoop
  *    FileSystem of the path, so any scheme works (file://, s3a://, …).
  *  - [[readDistributed]]: a DIRECTORY TREE of workbooks (a crawl of
  *    spreadsheet exports) via the vectorized binaryFile source +
  *    per-partition parse — files never move through the driver, bytes
  *    are never shuffled, and the parse is narrow per file. Columns
  *    are selected BY HEADER NAME per file, so workbooks with
  *    reordered columns still align.
  *
  * Parsing semantics: every cell surfaces as a STRING exactly as
  * stored (shared strings resolved, inline strings read, numbers as
  * their raw lexical form, booleans as true/false); gaps and trailing
  * missing cells are null. Typed interpretation (numbers, dates — the
  * latter need the workbook's style table) is the caller's cast, the
  * same contract as a header-only CSV read. DTD/external-entity
  * resolution is disabled (untrusted workbook hygiene).
  */
object XlsxSource {

  private def stax(): XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  private def zipEntry(bytes: Array[Byte], name: String): Option[Array[Byte]] = {
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      Iterator.continually(zis.getNextEntry).takeWhile(_ != null)
        .collectFirst { case e if e.getName == name => zis.readAllBytes() }
    } finally zis.close()
  }

  /** "A"->0, "AB"->27 — column letters to 0-based index. */
  private[sources] def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1

  /** sheet name -> worksheet part path (e.g. xl/worksheets/sheet1.xml),
    * in workbook order. */
  private[sources] def sheetParts(bytes: Array[Byte]): Seq[(String, String)] = {
    val wb = new String(zipEntry(bytes, "xl/workbook.xml")
      .getOrElse(throw new IllegalArgumentException(
        "not an xlsx: xl/workbook.xml missing")), "UTF-8")
    val rels = new String(zipEntry(bytes, "xl/_rels/workbook.xml.rels")
      .getOrElse(Array.emptyByteArray), "UTF-8")
    val relMap = """Id="(rId\d+)"[^>]*Target="([^"]+)"""".r
      .findAllMatchIn(rels).map(m => m.group(1) -> m.group(2)).toMap
    """<sheet [^>]*>""".r.findAllIn(wb).toSeq.flatMap { tag =>
      val name = """name="([^"]+)"""".r.findFirstMatchIn(tag).map(_.group(1))
      val rid = """r:id="(rId\d+)"""".r.findFirstMatchIn(tag).map(_.group(1))
      for (n <- name; r <- rid; t <- relMap.get(r))
        yield n -> (if (t.startsWith("/")) t.drop(1) else s"xl/$t")
    }
  }

  /** The workbook's sheet names, in order. */
  def sheetNames(bytes: Array[Byte]): Seq[String] = sheetParts(bytes).map(_._1)

  private def sharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    zipEntry(bytes, "xl/sharedStrings.xml") match {
      case None => IndexedSeq.empty
      case Some(xml) =>
        val r = stax().createXMLStreamReader(new ByteArrayInputStream(xml))
        val out = IndexedSeq.newBuilder[String]
        val sb = new StringBuilder
        var inSi = false
        var inT = false
        // <rPh> (phonetic guide runs, written by Excel for Japanese
        // workbooks) nests <t> elements whose text is NOT cell content —
        // concatenating them would corrupt the value with furigana
        var inRPh = false
        while (r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              r.getLocalName match {
                case "si" => inSi = true; inRPh = false; sb.clear()
                case "rPh" if inSi => inRPh = true
                case "t" if inSi && !inRPh => inT = true
                case _ => ()
              }
            case XMLStreamConstants.CHARACTERS if inT =>
              sb.append(r.getText)
            case XMLStreamConstants.END_ELEMENT =>
              r.getLocalName match {
                case "t" => inT = false
                case "rPh" => inRPh = false
                case "si" => inSi = false; out += sb.toString
                case _ => ()
              }
            case _ => ()
          }
        }
        r.close()
        out.result()
    }
  }

  /** Parse one sheet to raw rows of nullable strings, rectangularized
    * to the widest row. `sheet` = None picks the first sheet. */
  def parseSheet(bytes: Array[Byte],
                 sheet: Option[String] = None): Seq[Array[String]] = {
    val parts = sheetParts(bytes)
    val part = sheet match {
      case None => parts.headOption.map(_._2).getOrElse(
        throw new IllegalArgumentException("workbook has no sheets"))
      case Some(s) => parts.collectFirst { case (n, p) if n == s => p }
        .getOrElse(throw new IllegalArgumentException(
          s"no sheet named '$s'; workbook has: ${parts.map(_._1).mkString(", ")}"))
    }
    val strings = sharedStrings(bytes)
    val xml = zipEntry(bytes, part).getOrElse(
      throw new IllegalArgumentException(s"missing worksheet part $part"))
    val r = stax().createXMLStreamReader(new ByteArrayInputStream(xml))
    val rows = Seq.newBuilder[Array[String]]
    var row: scala.collection.mutable.ArrayBuffer[String] = null
    var cellCol = -1
    var cellType = ""
    var inV = false
    var inIsT = false
    val text = new StringBuilder
    def endCell(): Unit = if (row != null && cellCol >= 0) {
      while (row.length <= cellCol) row += null
      val raw = text.toString
      row(cellCol) = cellType match {
        case "s" => strings(raw.trim.toInt)
        case "b" => if (raw.trim == "1") "true" else "false"
        case _ => raw // str / inlineStr / number: lexical form
      }
      cellCol = -1
    }
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => row = scala.collection.mutable.ArrayBuffer.empty
            case "c" =>
              endCell() // defensive: self-closed <c/> never opens v/is
              val ref = Option(r.getAttributeValue(null, "r"))
              cellCol = ref.map(colIndex).getOrElse(row.length)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              text.clear()
            case "v" => inV = true
            case "t" if cellType == "inlineStr" => inIsT = true
            case _ => ()
          }
        case XMLStreamConstants.CHARACTERS if inV || inIsT =>
          text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" => inV = false
            case "t" => inIsT = false
            case "c" => endCell()
            case "row" =>
              if (row != null) rows += row.toArray
              row = null
            case _ => ()
          }
        case _ => ()
      }
    }
    r.close()
    val raw = rows.result()
    val width = if (raw.isEmpty) 0 else raw.map(_.length).max
    raw.map(r0 => if (r0.length == width) r0 else r0.padTo(width, null))
  }

  /** Strip the invisible junk real-world sheets carry in header cells
    * (BOM / zero-width marks) and trim. */
  private def cleanHeader(h: String, i: Int): String = {
    val c = Option(h).getOrElse("")
      .filterNot("\uFEFF\u200B\u200E\u200F".contains(_)).trim
    if (c.isEmpty) s"_c$i" else c
  }

  /** Read ONE workbook's sheet as a DataFrame of strings (first row =
    * header when `header`). Driver-side parse — the vocab-contract
    * path; sheets are dimension-sized. Any Hadoop FS scheme. */
  def readSheet(spark: SparkSession, path: String,
                sheet: Option[String] = None,
                header: Boolean = true): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val in = p.getFileSystem(spark.sessionState.newHadoopConf()).open(p)
    val bytes = try in.readAllBytes() finally in.close()
    val rows = parseSheet(bytes, sheet)
    val (names, data) =
      if (header && rows.nonEmpty)
        (rows.head.zipWithIndex.map { case (h, i) => cleanHeader(h, i) },
          rows.tail)
      else
        (rows.headOption.map(_.indices.map(i => s"_c$i").toArray)
          .getOrElse(Array.empty[String]), rows)
    val schema = StructType(names.map(StructField(_, StringType)).toSeq)
    spark.createDataFrame(
      java.util.Arrays.asList(data.map(r => Row.fromSeq(r.toSeq)): _*),
      schema)
  }

  /** Read a directory TREE of workbooks via the binaryFile source: one
    * output row per sheet row per file, `columns` selected by header
    * name per file (reordered columns align; a file missing a column
    * yields nulls for it). Narrow per-file parse on executors; the
    * driver never sees the bytes. Workbooks must be CELL-data sized
    * (an xlsx part must decompress in executor memory — the format is
    * not splittable within one file; parallelism comes from the file
    * count, the right mental model for spreadsheet crawls). */
  def readDistributed(spark: SparkSession, dir: String,
                      columns: Seq[String],
                      sheet: Option[String] = None,
                      glob: String = "*.xlsx"): DataFrame = {
    val schema = StructType(StructField("_source_file", StringType) +:
      columns.map(StructField(_, StringType)))
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", value = true)
      .load(dir)
      .select("path", "content")
    implicit val enc = Encoders.row(schema)
    bin.as[(String, Array[Byte])](
        Encoders.tuple(Encoders.STRING, Encoders.BINARY))
      .mapPartitions { files =>
        files.flatMap { case (path, bytes) =>
          val rows = parseSheet(bytes, sheet)
          if (rows.isEmpty) Iterator.empty
          else {
            val hdr = rows.head.zipWithIndex
              .map { case (h, i) => cleanHeader(h, i) }
            val idx = columns.map(hdr.indexOf(_)).toArray
            rows.tail.iterator.map { cells =>
              Row.fromSeq(path +: idx.toSeq.map(i =>
                if (i >= 0 && i < cells.length) cells(i) else null))
            }
          }
        }
      }.toDF()
  }

  /** Minimal xlsx WRITER (inline strings, one sheet) — the sink twin,
    * also the fixture builder for specs/oracles. Vocab-sized data only
    * (driver-side; the reader is the scale path, not this). */
  def writeXlsx(rows: Seq[Seq[String]], sheetName: String = "Sheet1")
      : Array[Byte] = {
    def xmlEsc(s: String): String = s.replace("&", "&amp;")
      .replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    def put(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
        """</Types>""")
    put("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        """</Relationships>""")
    put("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        s"""<sheets><sheet name="${xmlEsc(sheetName)}" sheetId="1" r:id="rId1"/></sheets>""" +
        """</workbook>""")
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
        """</Relationships>""")
    val body = rows.zipWithIndex.map { case (cells, ri) =>
      val cs = cells.zipWithIndex.collect {
        case (v, ci) if v != null =>
          val ref = { // 0-based -> A1-style
            var n = ci + 1; val sb = new StringBuilder
            while (n > 0) { sb.insert(0, ('A' + (n - 1) % 26).toChar); n = (n - 1) / 26 }
            sb.toString + (ri + 1)
          }
          s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${xmlEsc(v)}</t></is></c>"""
      }.mkString
      s"""<row r="${ri + 1}">$cs</row>"""
    }.mkString
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        s"""<sheetData>$body</sheetData></worksheet>""")
    z.close()
    bos.toByteArray
  }
}
