package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself, pinned: every `queries` entry must carry
  * a DuckDB oracle — a missing oracle silently downgrades that query to
  * a weaker rows-only check in the correctness gate. If an op is ever
  * genuinely not SQL-expressible, add it to the explicit allowlist here
  * so the omission is a reviewed decision, not drift. */
class ContractSpec extends AnyFunSuite {

  private val rowsOnlyAllowlist: Set[String] = Set.empty

  test("every query has an oracle (or is explicitly allowlisted)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val missing = q -- o -- rowsOnlyAllowlist
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
    val orphaned = o -- q
    assert(orphaned.isEmpty, s"oracles without a query: $orphaned")
  }

  test("oracle SQL references only driver-provided tables") {
    val known = Tables.names.toSet
    // lookbehinds: `IS DISTINCT FROM x` is an operator and
    // `EXTRACT(hour FROM ts)` names a column, not a scan
    val tableRef = ("(?i)(?<!DISTINCT )(?<!hour )(?<!day )(?<!month )" +
      "(?<!year )(?<!minute )(?<!second )(?<!epoch )(?<!dow )" +
      "\\bFROM\\s+([a-z_][a-z0-9_]*)").r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      tableRef.findAllMatchIn(sql).map(_.group(1).toLowerCase).foreach { t =>
        // CTE names and subquery aliases resolve before views; only flag
        // identifiers that are neither known tables nor defined in-query
        val defined =
          s"(?i)\\b$t\\s+AS\\s*(MATERIALIZED\\s*)?\\(".r
            .findFirstIn(sql).isDefined ||
          sql.toLowerCase.contains(s"$t(")
        assert(known.contains(t) || defined,
          s"$name references unknown table '$t'")
      }
    }
  }
}
