package graft.ops

import graft.SparkSpec

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("missingness: per-column null counts and percentages") {
    val df = Seq(
      (Some("a"), Some(1.0)), (None, Some(2.0)),
      (None, None), (Some("d"), Some(4.0))
    ).toDF("s", "v")
    val m = Quality.missingness(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(m("s") == ((2L, 50.0)))
    assert(m("v") == ((1L, 25.0)))
  }

  test("duplicates: n - countDistinct per column") {
    val df = Seq(("a", 1), ("a", 2), ("b", 2)).toDF("s", "v")
    val m = Quality.duplicates(df).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("s") == 1L && m("v") == 1L)
  }

  test("summaryStats: exact min/max/mean/count per group") {
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("h", 10.0))
      .toDF("grp", "v")
    val m = Quality.summaryStats(df, "v", Seq("grp")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(m("g") == ((3L, 1.0, 3.0, 2.0)))
    assert(m("h") == ((1L, 10.0, 10.0, 10.0)))
  }

  test("outOfRange counts rows outside bounds per group") {
    val df = Seq(("g", 50.0), ("g", 150.0), ("g", -1.0)).toDF("grp", "v")
    val r = Quality.outOfRange(df, "v", 0, 100, Seq("grp")).collect()(0)
    assert(r.getLong(1) == 2L && r.getLong(2) == 3L)
  }
}
