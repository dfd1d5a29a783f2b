package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact triangle counting by degree-ordered edge orientation (the
  * classic wedge-closing scheme of Schank & Wagner 2005 / Suri &
  * Vassilvitskii 2011): orient every undirected edge from its
  * (degree, node)-smaller endpoint to the larger, build wedges only from
  * each vertex's ORIENTED out-neighborhood, and close them against the
  * canonical edge set. Orientation caps every out-degree at O(√m) on any
  * graph — a hub of degree d contributes wedges from its low-degree
  * neighbors' tiny out-lists, not d² from its own — so the wedge volume
  * is O(m^1.5) worst-case instead of Σ deg² (quadratic in the hub), and
  * each triangle is found EXACTLY once (at its orientation-minimal
  * corner, with the remaining corners id-ordered).
  *
  * Scale shape: canonicalize + dedup is one exchange; degrees one
  * map-side-combined count joined back; wedges one equi-join on the
  * pivot; closing one equi-join on the (id-ordered) far pair; corner
  * attribution a per-row explode + final count. All equi-joins on key
  * hashes — no cartesian, no driver state.
  */
object Triangles {

  /** Canonical undirected edge set: (a < b), self-loops/nulls/duplicates
    * and orientation dropped.
    */
  private def canonical(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges.select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()

  /** Per-node triangle membership counts: (node, triangles), nodes in at
    * least one triangle.
    */
  def perNode(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val canon = canonical(edges, srcCol, dstCol)
    val deg = canon.select(col("a").as("n")).union(canon.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))

    val withDeg = canon
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
    // total order (degree, node): acyclic orientation, out-degree O(√m)
    val oriented = withDeg.select(
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
        struct(col("a").as("s"), col("b").as("t")))
        .otherwise(struct(col("b").as("s"), col("a").as("t"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"))

    // wedges at the orientation-minimal corner; far pair id-ordered so the
    // closing edge is exactly one canonical row
    val wedges = oriented.select(col("s").as("u"), col("t").as("v"))
      .join(oriented.select(col("s").as("u"), col("t").as("w")), "u")
      .filter(col("v") < col("w"))
    val triangles = wedges.join(canon,
      wedges("v") === canon("a") && wedges("w") === canon("b"))
      .select(col("u"), col("v"), col("w"))

    triangles
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
  }

  /** Global triangle count (single row). */
  def globalCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    perNode(edges, srcCol, dstCol)
      .agg(coalesce((sum(col("triangles")) / 3).cast("long"), lit(0L))
        .as("triangles"))
}
