package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkEntry, SparkSpec, Tables}

/** The bucketed 3-table longitudinal assembly (`j_bucketed_3way`) must
  * actually deliver the zero-exchange plan the write-time co-location
  * pays for — with broadcast disabled so bucketing, not a broadcast, is
  * what saves the shuffles — and stay row-identical to the unbucketed
  * computation. */
class BucketedAssemblySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("3-table bucketed join + rollup: zero exchanges, == unbucketed") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = SparkEntry.queries("j_bucketed_3way")(spark, dir)
      df.count()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(1500))

      val ev = Tables.load(spark, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id").agg(count(lit(1)).cast("long").as("n_click"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy("user_id")
        .agg(sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("view_value"))
      val expected = ev.select("user_id", "event_id", "value")
        .join(clicks, Seq("user_id"))
        .join(views, Seq("user_id"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).cast("long").as("n_events"),
          max(col("n_click")).cast("long").as("n_click"),
          max(col("view_value")).as("view_value"))
      assert(df.except(expected).count() == 0 &&
        expected.except(df).count() == 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
