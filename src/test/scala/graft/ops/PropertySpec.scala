package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSpec

/** ScalaCheck invariants over the window operators (SURVEY.md §5.4):
  * generated event sets, not hand-picked fixtures. Sample counts stay
  * small because every sample is a Spark job. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(12).withWorkers(1)

  private def check(name: String)(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, s"$name: $r")
  }

  private val eventsGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 25)
    evs <- Gen.listOfN(n, for {
      user <- Gen.choose(1L, 3L)
      ts <- Gen.choose(0L, 10000L)
    } yield (user, ts))
  } yield evs

  test("leadEpisodes: episodes per user never overlap; stop null only on last") {
    check("episode-non-overlap")(Prop.forAll(eventsGen) { evs =>
      val df = evs.zipWithIndex
        .map { case ((u, t), i) => (i.toLong, u, t) }
        .toDF("event_id", "user_id", "ts")
      val eps = WindowOps.leadEpisodes(df, Seq("user_id"), "ts", "stop_ts",
          Seq(col("event_id")))
        .select("user_id", "ts", "stop_ts", "event_id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3)))
      eps.groupBy(_._1).forall { case (_, rows) =>
        val sorted = rows.sortBy(r => (r._2, r._4))
        // exactly one open episode per user, and it is the last
        sorted.count(_._3.isEmpty) == 1 && sorted.last._3.isEmpty &&
        // each stop equals the next row's start -> intervals cannot overlap
        sorted.sliding(2).forall {
          case Array(a, b) => a._3.contains(b._2)
          case _ => true
        }
      }
    })
  }

  test("fillDownUp is idempotent and fills everything when any value exists") {
    val gen = for {
      n <- Gen.choose(1, 20)
      vs <- Gen.listOfN(n, Gen.option(Gen.choose(0, 100)))
    } yield vs
    check("fill-idempotent")(Prop.forAll(gen) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("event_id", "v")
        .withColumn("user_id", lit(1L))
      def fill(d: org.apache.spark.sql.DataFrame) =
        WindowOps.fillDownUp(d, Seq("user_id"), Seq(col("event_id")), Seq("v"))
      val once = fill(df).orderBy("event_id")
        .select("v").as[Option[Int]].collect().toSeq
      val twice = fill(fill(df)).orderBy("event_id")
        .select("v").as[Option[Int]].collect().toSeq
      once == twice &&
        (vs.forall(_.isEmpty) || once.forall(_.nonEmpty))
    })
  }

  test("sessionize: session ids start at 1, increase by at most 1 per event") {
    check("session-monotone")(Prop.forAll(eventsGen) { evs =>
      val df = evs.zipWithIndex
        .map { case ((u, t), i) => (i.toLong, u,
          new java.sql.Timestamp(t * 1000)) }
        .toDF("event_id", "user_id", "ts")
      val out = WindowOps.sessionize(df, Seq("user_id"), "ts",
          gapSeconds = 600, tiebreak = Seq(col("event_id")))
        .select("user_id", "ts", "event_id", "session_id")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
          r.getLong(3)))
      out.groupBy(_._1).forall { case (_, rows) =>
        val ids = rows.sortBy(r => (r._2, r._3)).map(_._4)
        ids.head == 1L && ids.sliding(2).forall {
          case Array(a, b) => b == a || b == a + 1
          case _ => true
        }
      }
    })
  }
}
