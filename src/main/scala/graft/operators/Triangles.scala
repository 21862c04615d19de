package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed triangle counting by DEGREE-ORDERED node iteration
  * (Suri & Vassilvitskii, "Counting Triangles and the Curse of the
  * Last Reducer", WWW 2011): orient every edge from its
  * lower-(degree, id) endpoint to the higher one and generate wedges
  * only at the LOW end. The naive node-iterator makes a hub of degree
  * d emit d² wedges on one reducer — the paper's "last reducer" curse
  * and exactly the skew shape near-dup/co-occurrence graphs have; the
  * degree ordering bounds every vertex's oriented out-degree by
  * O(√m), so wedge fan-out is O(m^{3/2}) TOTAL with no hot key.
  * Triangle membership is a semi-join of wedges against the oriented
  * edge set (the closing edge is oriented the same way by
  * construction, so one equi-join suffices).
  *
  * Integer-only (counts and ids) — deterministic at any parallelism;
  * the oracle replays the naive canonical three-way join, which the
  * degree-ordered plan must equal exactly.
  */
object Triangles {

  /** Count triangles in the undirected graph given by `pairs`
    * (self-loops dropped, duplicate/reversed edges collapsed).
    * Output: ONE row (n_vertices, n_edges, n_triangles — all BIGINT).
    */
  def triangleCount(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e0 = pairs
      .select(least(col(aCol), col(bCol)).cast("long").as("a"),
        greatest(col(aCol), col(bCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = e0.select(col("a").as("v")).unionAll(e0.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    // orient by the (degree, id) total order; carry the head's order
    // key for the wedge-side comparison
    val withDeg = e0
      .join(deg.select(col("v").as("a"), col("d").as("_da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("_db")), Seq("b"))
    val aFirst = struct(col("_da"), col("a")) < struct(col("_db"), col("b"))
    val ord = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("u"),
      when(aFirst, col("b")).otherwise(col("a")).as("v"),
      when(aFirst, col("_db")).otherwise(col("_da")).as("vd"))
    // wedges at the low-order center; the candidate closing edge
    // (v1 → v2) is oriented identically because both comparisons use
    // the same total order
    val w1 = ord.select(col("u"), col("v").as("v1"), col("vd").as("d1"))
    val w2 = ord.select(col("u"), col("v").as("v2"), col("vd").as("d2"))
    val wedges = w1.join(w2, Seq("u"))
      .filter(struct(col("d1"), col("v1")) < struct(col("d2"), col("v2")))
      .select(col("v1").as("u"), col("v2").as("v"))
    val triangles = wedges
      .join(ord.select("u", "v"), Seq("u", "v"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    e0.agg(count(lit(1)).as("n_edges"))
      .crossJoin(broadcast(deg.agg(count(lit(1)).as("n_vertices"))))
      .crossJoin(broadcast(triangles))
      .select(col("n_vertices"), col("n_edges"), col("n_triangles"))
  }
}
