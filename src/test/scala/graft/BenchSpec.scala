package graft

import org.apache.spark.sql.functions._

/** The bench harness must not be able to report a crashing query as a
  * healthy number (round-3 verdict #3). */
class BenchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("runQueries records a broken query as -1 + error, not a time") {
    val qs: Map[String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame] = Map(
      "ok_query" -> ((s, d) => Tables.load(s, d, "region")),
      // The probe must survive ColumnPruning under count() (round-4
      // verdict #1: a raise_error in an unreferenced SELECT column is
      // pruned and the "broken" query succeeds). Putting it in the
      // FILTER condition makes it load-bearing: the error surfaces
      // during count() — at optimization time if ConstantFolding
      // evaluates the foldable raise_error, otherwise per row — and
      // either way runQueries must catch it.
      "broken_query" -> ((s, d) =>
        Tables.load(s, d, "region")
          .filter(col("r_regionkey") >
            raise_error(lit("deliberately broken")).cast("int"))))
    val res = SparkSpec.withExpectedTaskFailures(
      Bench.runQueries(spark, dir, qs))
    val (okSec, okErr) = res("ok_query")
    assert(okSec >= 0.0 && okErr.isEmpty)
    val (badSec, badErr) = res("broken_query")
    assert(badSec == -1.0)
    assert(badErr.exists(_.contains("deliberately broken")), badErr)
  }

  test("isRegression: ratio AND absolute floor must both trip; " +
    "missing/broken prev never flags") {
    // sub-second jitter: 80ms -> 130ms is a 1.6x ratio but noise
    assert(!Bench.isRegression(0.08, 0.13))
    // 1.5x exactly + the 0.5s floor exactly: gate requires STRICTLY over
    assert(!Bench.isRegression(1.0, 1.5))
    assert(Bench.isRegression(1.0, 1.51))
    // big query: ratio dominates (10 -> 12 is +2s but only 1.2x)
    assert(!Bench.isRegression(10.0, 12.0))
    assert(Bench.isRegression(10.0, 15.01))
    // small query: absolute floor dominates (0.2 -> 0.4 is 2x but +0.2s)
    assert(!Bench.isRegression(0.2, 0.4))
    // no previous number / failed previous run -> never a flag
    assert(!Bench.isRegression(0.0, 99.0))
    assert(!Bench.isRegression(-1.0, 99.0))
  }

  test("adjudicateVerdict: plateau back under the gate = contention, " +
    "plateau still over = real; plateau() measures a live query") {
    // the synthetic-contention case: prev 1.0s, contended run said
    // 3.0s, quiet end-of-run plateau 1.1s -> the flag self-clears
    assert(Bench.adjudicateVerdict(1.0, 1.1) == "contention")
    // a genuine plan change stays slow when re-measured in isolation
    // ON A QUIET BOX (load well under cpus/4)
    assert(Bench.adjudicateVerdict(1.0, 2.5) == "real")
    assert(Bench.adjudicateVerdict(1.0, 2.5, 1.9, 32) == "real")
    // round-11 verdict #2 fixture: plateau over the gate but the box
    // is still loaded at measurement time (load >= cpus/4) — the
    // measurement is invalid, the verdict must NOT certify "real"
    assert(Bench.adjudicateVerdict(1.0, 2.5, 8.0, 32) ==
      "contention-suspect")
    assert(Bench.adjudicateVerdict(0.316, 1.199, 4.8, 4) ==
      "contention-suspect")
    // high load with a plateau UNDER the gate still self-clears: the
    // query came back fast even on a loaded box
    assert(Bench.adjudicateVerdict(1.0, 1.1, 30.0, 32) == "contention")
    // a plateau that ERRORS (-1) is its own verdict (ADVICE r11:
    // "contention" here read as contention-cleared unless the reader
    // noticed the -1 plateau value)
    assert(Bench.adjudicateVerdict(1.0, -1.0) == "error")
    assert(Bench.adjudicateVerdict(1.0, -1.0, 30.0, 32) == "error")
    val pl = Bench.plateau(spark, dir,
      (s, d) => Tables.load(s, d, "region"), runs = 2)
    assert(pl > 0.0 && pl < 30.0, s"plateau=$pl")
    val bad = SparkSpec.withExpectedTaskFailures(
      Bench.plateau(spark, dir, (s, d) =>
        Tables.load(s, d, "region")
          .filter(col("r_regionkey") >
            raise_error(lit("boom")).cast("int")), runs = 2))
    assert(bad == -1.0)
  }

  test("foldPlateaus: a quiet plateau replaces a contention-inflated " +
    "sweep number; errored (-1) and slower plateaus never overwrite") {
    val results = Map(
      "inflated" -> (11.13, Option.empty[String]),
      "errored_plateau" -> (3.0, Option.empty[String]),
      "plateau_slower" -> (1.0, Option.empty[String]),
      "untouched" -> (0.5, Option.empty[String]))
    // tuple: (name, prev, now, plateau, plateau_load, verdict)
    val adj = Seq(
      ("inflated", 1.0, 11.13, 1.23, 0.5, "contention"),
      ("errored_plateau", 1.0, 3.0, -1.0, 0.5, "error"),
      ("plateau_slower", 0.4, 1.0, 1.6, 0.5, "real"),
      // totality (r18 ADVICE): an adjudicated key absent from the
      // results map is ignored, not a NoSuchElementException
      ("absent_from_results", 1.0, 9.0, 0.9, 0.5, "contention"))
    val out = Bench.foldPlateaus(results, adj)
    assert(!out.contains("absent_from_results"))
    // the r17 t_bleu case: the min estimator sees the plateau runs
    assert(out("inflated") == ((1.23, None)))
    // -1 is an error sentinel, not a time — must never overwrite
    assert(out("errored_plateau") == ((3.0, None)))
    // min semantics: a slower plateau cannot worsen the estimate
    assert(out("plateau_slower") == ((1.0, None)))
    assert(out("untouched") == ((0.5, None)))
  }
}
