package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ReshapeSpec extends SparkSpec {
  import spark.implicits._

  test("separate: splits '120/80' into sbp/dbp; short input yields null tail") {
    val df = Seq(("a", "120/80"), ("b", "95")).toDF("id", "bp")
    val out = Reshape.separate(df, "bp", "/", Seq("sbp", "dbp"))
      .orderBy("id").select("sbp", "dbp")
      .as[(Option[String], Option[String])].collect()
    assert(out.toSeq == Seq((Some("120"), Some("80")), (Some("95"), None)))
  }

  test("unpivot: wide to long preserves ids, optional null drop") {
    val df = Seq((1L, Some(10.0), Option.empty[Double])).toDF("id", "a", "b")
    val all = Reshape.unpivot(df, Seq("id"), Seq("a", "b"), "k", "v")
    assert(all.count() == 2)
    val dropped = Reshape.unpivot(df, Seq("id"), Seq("a", "b"), "k", "v",
      dropNulls = true)
    assert(dropped.select("k").as[String].collect().toSeq == Seq("a"))
  }

  test("pivotWider: duplicate (id, name) keys resolved by explicit agg") {
    val df = Seq(
      ("e1", "peep", "5"), ("e1", "peep", "8"), // duplicate key
      ("e1", "fio2", "40")
    ).toDF("enc", "k", "v")
    // pin max semantics (deterministic), per SURVEY §7.1
    val out = Reshape.pivotWider(df, Seq("enc"), "k", "v",
      names = Seq("peep", "fio2"), agg = c => max(c))
    val row = out.collect()(0)
    assert(row.getAs[String]("peep") == "8" && row.getAs[String]("fio2") == "40")
  }

  test("unnest: explodes array to one row per element") {
    val df = Seq((1L, "x y z")).toDF("id", "s")
    val out = Reshape.unnest(df, split(col("s"), " "), "w", Seq("id"))
    assert(out.select("w").as[String].collect().toSeq == Seq("x", "y", "z"))
  }
}
