package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed graph analytics over plain edge DataFrames — the
  * companion surface to the pointer-jumping connected components in
  * [[graft.text.Dedup.duplicateClusters]] and the Pregel-style
  * PageRank in [[graft.text.TextOps.textRank]]: graphs here are
  * tables, algorithms are joins, and the scale levers are the
  * standard relational ones (orientation, key shuffles, no
  * vertex-centric runtime needed).
  */
object Graphs {

  /** Canonical undirected edge list: (u, v) with u < v, self-loops
    * dropped, duplicates (either orientation) collapsed. One
    * distinct. */
  def canonicalEdges(edges: DataFrame, aCol: String,
                     bCol: String): DataFrame =
    edges.select(least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull &&
        col("v").isNotNull)
      .distinct()

  /** Per-node triangle counts (node-iterator with DEGREE ORIENTATION
    * — Schank & Wagner 2005; the MapReduce formulation is Suri &
    * Vassilvitskii WWW'11): each undirected edge is directed from its
    * lower-(degree, id) endpoint to the higher, wedges are one
    * self-join of the oriented list on the middle vertex, and a wedge
    * a→b→c is a triangle iff the closing edge a→c is oriented too.
    * The orientation is a total order, so every triangle is
    * enumerated EXACTLY once (its least corner sees both out-edges) —
    * no /3 correction, no duplicate pairs.
    *
    * Why orientation matters at scale: wedge count is Σ_v outdeg(v)²,
    * and directing edges toward higher degree caps every out-degree
    * at O(√m) on ANY graph — a star's hub gets out-degree ~0 and its
    * spokes 1, so the skewed-degree corpus graph (stopword-like hub
    * terms) generates wedges proportional to the answer, not to
    * hub-degree². Plan: one distinct, one node-sized degree agg
    * joined back (AQE broadcasts when vocab-sized), two equi-join
    * shuffles (wedge build + closure probe), one corner explode +
    * hash agg. Nothing all-pairs, nothing driver-side. */
  def triangleCounts(edges: DataFrame, aCol: String,
                     bCol: String): DataFrame = {
    val e = canonicalEdges(edges, aCol, bCol)
    val deg = e.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    val withDeg = e
      .join(deg.select(col("n").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("deg").as("dv")), Seq("v"))
    val uFirst = (col("du") < col("dv")) ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = withDeg.select(
      when(uFirst, col("u")).otherwise(col("v")).as("src"),
      when(uFirst, col("v")).otherwise(col("u")).as("dst"))
    val wedges = oriented.select(col("src").as("a"), col("dst").as("b"))
      .join(oriented.select(col("src").as("b"), col("dst").as("c")),
        Seq("b"))
    val triangles = wedges.join(
      oriented.select(col("src").as("a"), col("dst").as("c")),
      Seq("a", "c"))
    triangles
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
  }
}
