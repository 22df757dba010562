package graft.tools

/** Generated operator catalog + the board's structural invariants.
  *
  * The board is deep (300+ oracled queries across a dozen modules),
  * and its three registries live in DIFFERENT places with no
  * compiler-checked linkage: `SparkEntry.queries` / `oracleSql` are
  * Map LITERALS (a duplicate key silently SHADOWS the earlier entry —
  * later wins, no compile error; round 13 caught three near-dup op
  * designs and one real shadowing hazard by hand), and the ScaleSweep
  * roster is a Seq in another file. This tool makes the linkage an
  * ARTIFACT: it extracts the keys straight from SOURCE (the only
  * place duplicates are still visible), joins them with the sweep
  * roster and the latest BENCH_FULL.json timings, and writes
  * CATALOG.md — one row per query: oracle? sweep row? last bench
  * seconds. CatalogSpec re-derives everything and fails on:
  * duplicate keys, a query/oracle set mismatch, a ≥2 s batch query
  * with no sweep row and no documented exemption, or a stale
  * CATALOG.md.
  *
  * Usage: runMain graft.tools.Catalog
  */
object Catalog {

  val entrySrc = "src/main/scala/graft/SparkEntry.scala"
  val sweepSrc = "src/main/scala/graft/tools/ScaleSweep.scala"

  /** Queries whose bench time is harness floor, not plan work — a
    * sweep ratio would measure the micro-batch/checkpoint machinery.
    * Their scale posture is measured by the STATE sweeps instead
    * (DistinctStateSweep; BENCH_SF1 streaming-state sections). */
  def streamingFloor(name: String): Boolean =
    name.startsWith("s_stream") || name.startsWith("s7_stream") ||
      name == "s_two_tier_dedup"

  /** Documented exemptions from the heavy-query sweep gate, with the
    * reason a ratio row would not be meaningful. (Streaming-floor
    * queries are exempted by rule, not listed here.) */
  val sweepExempt: Map[String, String] = Map.empty

  /** Bench seconds at/above which a batch query must carry a sweep
    * roster row (or an exemption above). */
  val heavySeconds = 2.0

  private def readFile(p: String): String =
    java.nio.file.Files.readString(java.nio.file.Paths.get(p))

  /** Key lists (NOT sets — duplicates preserved) of the `queries` and
    * `oracleSql` Map literals, extracted from source. The runtime
    * Maps cannot reveal duplicates: the literal keeps the LAST entry.
    * Entries sit at 4-space indent (`    "name" -> ...`); oracle SQL
    * bodies are `|`-margin strings, so no SQL line matches. */
  def sourceKeys(src: String = readFile(entrySrc))
      : (Seq[String], Seq[String]) = {
    val iq = src.indexOf("def queries")
    val io = src.indexOf("def oracleSql")
    require(iq >= 0 && io > iq, "SparkEntry blocks not found")
    val re = """(?m)^    "([a-z0-9_]+)" ->""".r
    (re.findAllMatchIn(src.substring(iq, io)).map(_.group(1)).toSeq,
      re.findAllMatchIn(src.substring(io)).map(_.group(1)).toSeq)
  }

  /** ScaleSweep roster names (6-space indent entries). */
  def rosterKeys(src: String = readFile(sweepSrc)): Seq[String] = {
    val re = """(?m)^      "([^"]+)" ->""".r
    re.findAllMatchIn(src).map(_.group(1)).toSeq
  }

  /** Implementing module per query, derived from each entry's source
    * segment (the text between its key and the next entry's key):
    * the first operator-library reference wins; a query built purely
    * from the DataFrame API reads "inline". */
  def modules(src: String = readFile(entrySrc)): Map[String, String] = {
    val iq = src.indexOf("def queries")
    val io = src.indexOf("def oracleSql")
    val block = src.substring(iq, io)
    val entryRe = """(?m)^    "([a-z0-9_]+)" ->""".r
    val hits = entryRe.findAllMatchIn(block).toSeq
    val libs = Seq(
      "BlockedDataset" -> "clif.BlockedDataset",
      "ClifEtl" -> "clif.ClifEtl",
      "EventStreams" -> "streaming.EventStreams",
      "Multimodal" -> "media.Multimodal",
      "Similarity" -> "sim.Similarity",
      "LshIndex" -> "text.LshIndex",
      "Dedup." -> "text.Dedup",
      "TextOps" -> "text.TextOps",
      "Linkage" -> "ops.Linkage",
      "Graphs" -> "ops.Graphs",
      "Sketches" -> "ops.Sketches",
      "WindowOps" -> "ops.WindowOps",
      "Analytics" -> "ops.Analytics",
      "Quality" -> "ops.Quality",
      "Reshape" -> "ops.Reshape",
      "Scalars" -> "ops.Scalars",
      "Joins" -> "ops.Joins",
      "Merge" -> "ops.Merge",
      "Scale." -> "ops.Scale",
      "Prefix" -> "ops.Prefix",
      "UriSource" -> "sources.UriSource",
      "XlsxSource" -> "sources.XlsxSource",
      "FixedWidth" -> "sources.FixedWidth")
    hits.zipWithIndex.map { case (m, i) =>
      val end = if (i + 1 < hits.length) hits(i + 1).start
                else block.length
      val seg = block.substring(m.start, end)
      val mod = libs.collectFirst {
        case (needle, name) if seg.contains(needle) => name
      }.getOrElse("inline")
      m.group(1) -> mod
    }.toMap
  }

  /** A query has a sweep row if any roster entry names it — exact or
    * as a parenthesized variant (`semDedup(nlist∝n)` covers nothing;
    * `name` or `name(...)` covers `name`). */
  def swept(name: String, roster: Seq[String]): Boolean =
    roster.exists(r => r == name || r.startsWith(name + "("))

  def benchSeconds(): Map[String, Double] = {
    val txt = readFile("BENCH_FULL.json")
    // minimal extraction of the {"queries": {...}} object — no JSON
    // lib on the unmanaged classpath; bench writes flat "name": secs
    val re = """"([A-Za-z0-9_]+)"\s*:\s*([0-9.]+)""".r
    val qStart = txt.indexOf("\"queries\"")
    if (qStart < 0) Map.empty
    else {
      val qEnd = txt.indexOf("}", qStart)
      re.findAllMatchIn(txt.substring(qStart, qEnd))
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
  }

  def render(): String = {
    val (qk, ok) = sourceKeys()
    val roster = rosterKeys()
    val bench = benchSeconds()
    val mods = modules()
    val sb = new StringBuilder
    sb ++= "# CATALOG — generated operator board "
    sb ++= "(runMain graft.tools.Catalog)\n\n"
    sb ++= s"${qk.size} queries; every row spec-enforced by " +
      "CatalogSpec (duplicate keys, query/oracle set equality, " +
      s"sweep rows for batch queries ≥ ${heavySeconds}s, staleness " +
      "of this file).\n\n"
    sb ++= "| query | module | oracle | sweep row | " +
      "bench s (last full run) |\n"
    sb ++= "|---|---|---|---|---|\n"
    qk.sorted.foreach { q =>
      val o = if (ok.contains(q)) "y" else "MISSING"
      val s =
        if (swept(q, roster)) "y"
        else if (streamingFloor(q)) "state-sweep (streaming floor)"
        else sweepExempt.get(q).map(r => s"exempt: $r").getOrElse("-")
      val b = bench.get(q).map(v => f"$v%.2f").getOrElse("-")
      sb ++= s"| $q | ${mods.getOrElse(q, "inline")} | $o | $s | $b |\n"
    }
    sb.result()
  }

  /** The catalog with the VOLATILE bench column stripped — what the
    * staleness gate compares. The driver reruns graft.Bench each
    * round, which rewrites BENCH_FULL.json after the catalog was
    * generated; per-query seconds therefore must not participate in
    * the staleness byte-compare, or every post-bench `sbt test`
    * would see a stale file. The structural columns (query, module,
    * oracle, sweep) are the gate; the seconds are advisory. */
  def stripBench(text: String): String =
    text.linesIterator.map { l =>
      if (l.startsWith("|")) l.replaceAll("""\|[^|]*\|\s*$""", "|")
      else l
    }.mkString("\n")

  def main(args: Array[String]): Unit = {
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("CATALOG.md"), render())
    val (qk, _) = sourceKeys()
    println(s"[catalog] wrote CATALOG.md (${qk.size} queries)")
  }
}
