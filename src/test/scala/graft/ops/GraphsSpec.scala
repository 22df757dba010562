package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  test("triangleCounts: known triangles counted once per corner; " +
    "stars contribute none; duplicate/reversed/self edges collapse") {
    // K4 on {a,b,c,d}  -> 4 triangles, each node in 3
    // triangle {x,y,z} -> 1 triangle, each node in 1
    // star hub s with 4 spokes -> 0 triangles
    val k4 = Seq("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c",
      "b" -> "d", "c" -> "d")
    val tri = Seq("x" -> "y", "y" -> "z", "z" -> "x")
    val star = Seq("s" -> "p1", "s" -> "p2", "s" -> "p3", "s" -> "p4")
    val noise = Seq("b" -> "a", "a" -> "b", "a" -> "a") // dup/rev/self
    val edges = (k4 ++ tri ++ star ++ noise).toDF("m", "n")
    val got = Graphs.triangleCounts(edges, "m", "n")
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L,
      "x" -> 1L, "y" -> 1L, "z" -> 1L), got.toString)
    // global count: sum of corners / 3
    assert(got.values.sum / 3 == 5L)
  }

  test("triangleCounts: partitioning-invariant") {
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "c" -> "d")
      .toDF("m", "n")
    val one = Graphs.triangleCounts(edges.repartition(1), "m", "n")
      .as[(String, Long)].collect().toMap
    val many = Graphs.triangleCounts(edges.repartition(7), "m", "n")
      .as[(String, Long)].collect().toMap
    assert(one == many && one == Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
  }

  test("kCore: a pendant path cascades away one node per round, the " +
    "triangle survives k=2; rounds cap freezes a partial peel") {
    // triangle {x,y,z} + path x-p1-p2-p3-p4 (pendant chain)
    val edges = Seq("x" -> "y", "y" -> "z", "z" -> "x",
      "x" -> "p1", "p1" -> "p2", "p2" -> "p3", "p3" -> "p4")
      .toDF("m", "n")
    // k=2: p4 (deg 1) peels, then p3, then p2, then p1 — 4 cascade
    // rounds; the triangle (all deg 2, x deg 3 until p1 leaves) stays
    val core = Graphs.kCore(edges, "m", "n", k = 2, rounds = 8)
      .as[(String, Long)].collect().toMap
    assert(core == Map("x" -> 2L, "y" -> 2L, "z" -> 2L), core.toString)
    // rounds=2 stops mid-cascade: p4, p3 gone; p2 (now deg 1) remains
    val partial = Graphs.kCore(edges, "m", "n", k = 2, rounds = 2)
      .as[(String, Long)].collect().toMap
    assert(partial == Map("x" -> 3L, "y" -> 2L, "z" -> 2L,
      "p1" -> 2L, "p2" -> 1L), partial.toString)
    // k above the max degree empties the graph
    assert(Graphs.kCore(edges, "m", "n", k = 5, rounds = 8).count() == 0)
  }

  test("pageRank: scalar replication on a 3-node graph with a " +
    "dangling sink; mass conserved; weights bias the walk") {
    // a ->(3) b, a ->(1) c, b ->(1) c; c is a SINK (dangling)
    val edges = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "c", 1L))
      .toDF("s", "d", "w")
    val got = Graphs.pageRank(edges, "s", "d", col("w"),
        damping = 0.85, iters = 2)
      .as[(String, Double)].collect().toMap
    // scalar replication of the exact arithmetic: round6 via
    // BigDecimal HALF_UP on the double, products/sums on the 6dp
    // values are exact in double at these magnitudes
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d = 0.85
    val n = 3.0
    var r = Map("a" -> r6(1.0 / n), "b" -> r6(1.0 / n),
      "c" -> r6(1.0 / n))
    val p = Map(("a", "b") -> r6(3.0 / 4.0), ("a", "c") -> r6(1.0 / 4.0),
      ("b", "c") -> r6(1.0))
    for (_ <- 1 to 2) {
      val dang = r("c") // only sink
      val contrib = Map(
        "b" -> r6(r("a") * p(("a", "b"))),
        "c" -> (r6(r("a") * p(("a", "c"))) + r6(r("b") * p(("b", "c")))))
      r = r.keys.map(v => v -> r6((1.0 - d) / n +
        d * (contrib.getOrElse(v, 0.0) + dang / n))).toMap
    }
    assert(got == r, s"got $got want $r")
    // teleport + dangling redistribution conserve mass (to rounding)
    assert(math.abs(got.values.sum - 1.0) < 1e-4, got.toString)
    // the 3x-weighted a->b edge must rank b above a
    assert(got("b") > got("a") && got("c") > got("b"), got.toString)
  }

  test("labelPropagation: two disjoint triangles converge to their " +
    "min-member label; early stop equals a larger round budget; a " +
    "single edge 2-cycles deterministically by round parity") {
    import spark.implicits._
    val tri = Seq(("a", "b"), ("b", "c"), ("a", "c"),
      ("d", "e"), ("e", "f"), ("d", "f")).toDF("x", "y")
    val got = Graphs.labelPropagation(tri, "x", "y", rounds = 4)
      .as[(String, String)].collect().toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a",
      "d" -> "d", "e" -> "d", "f" -> "d"), got.toString)
    // fixpoint invariance: 8 rounds == 4 rounds once converged
    val more = Graphs.labelPropagation(tri, "x", "y", rounds = 8)
      .as[(String, String)].collect().toMap
    assert(more == got, more.toString)
    // bipartite 2-cycle: even budget lands on the identity labels,
    // odd budget on the swapped ones -- parity-deterministic
    val edge = Seq(("a", "b")).toDF("x", "y")
    val even = Graphs.labelPropagation(edge, "x", "y", rounds = 4)
      .as[(String, String)].collect().toMap
    assert(even == Map("a" -> "a", "b" -> "b"), even.toString)
    val odd = Graphs.labelPropagation(edge, "x", "y", rounds = 3)
      .as[(String, String)].collect().toMap
    assert(odd == Map("a" -> "b", "b" -> "a"), odd.toString)
  }

  test("personalizedPageRank: hand-iterated chain values; mass stays " +
    "seed-centered and sums to 1 (dangling teleports to seeds); " +
    "off-graph seeds are ignored") {
    import spark.implicits._
    // A -> B -> C, seed {A}, d = .85, 2 rounds:
    // r1 = (.15, .85, 0); r2 = (.15, .1275, .7225)
    val edges = Seq(("A", "B", 1L), ("B", "C", 1L))
      .toDF("src", "dst", "w")
    def run(seedIds: Seq[String]) =
      Graphs.personalizedPageRank(edges, "src", "dst", col("w"),
          seedIds.toDF("id"), "id", damping = 0.85, iters = 2)
        .as[(String, Double)].collect().toMap
    val got = run(Seq("A"))
    assert(got == Map("A" -> 0.15, "B" -> 0.1275, "C" -> 0.7225),
      got.toString)
    assert(math.abs(got.values.sum - 1.0) < 1e-5, got.toString)
    // a seed absent from the graph changes nothing (|S intersect| = 1)
    assert(run(Seq("A", "Z")) == got)
    // seeding elsewhere moves the mass: seed {C} (a sink) keeps
    // everything on C via the dangling-to-seed teleport
    val cSeed = run(Seq("C"))
    assert(cSeed("C") == 1.0 && cSeed("A") == 0.0, cSeed.toString)
  }
}
