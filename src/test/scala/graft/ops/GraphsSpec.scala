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
}
