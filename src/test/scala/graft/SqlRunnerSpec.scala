package graft

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The SQL surface: registered views + native functions execute the same
  * SQL text the oracle uses (BASELINE "Spark SQL" parity). */
class SqlRunnerSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q1_agg SQL text runs through the registered-view surface") {
    Tables.registerAll(spark, dir)
    // the flagship aggregation, as SQL (Spark dialect of oracle q1_agg)
    val out = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)
    assert(out.count() > 0)
    // cross-check against the DataFrame path
    val df = SparkEntry.queries("q1_agg")(spark, dir)
      .select("l_returnflag", "l_linestatus", "sum_qty", "n")
    assert(out.except(df).count() == 0 && df.except(out).count() == 0)
  }

  test("native functions compose with views in SQL") {
    Tables.registerAll(spark, dir)
    val r = spark.sql(
      """SELECT doc_id, portable_simhash(split(trim(text), '\\s+')) AS h,
        |  normalize_spaces(lower(text)) AS norm
        |FROM documents LIMIT 5""".stripMargin).collect()
    assert(r.length == 5 && r.forall(row => !row.isNullAt(1)))
  }

  test("statement splitter: semicolons, comments, blanks") {
    val s = SqlRunner.statements(
      "SELECT 1;\n-- a comment\nSELECT 2;\n\n;  ")
    assert(s == Seq("SELECT 1", "SELECT 2"))
  }
}
