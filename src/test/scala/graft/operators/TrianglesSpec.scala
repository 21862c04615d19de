package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def count(edges: Seq[(Long, Long)], parts: Int = 2): (Long, Long, Long) =
    Triangles.triangleCount(edges.toDF("a", "b").repartition(parts), "a", "b")
      .as[(Long, Long, Long)].head()

  test("known graphs: K4 has 4 triangles, C5 none, a wheel has rim-many") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    assert(count(k4) === ((4L, 6L, 4L)))
    val c5 = (0L until 5L).map(i => (i, (i + 1) % 5))
    assert(count(c5) === ((5L, 5L, 0L)))
    // wheel: hub 100 → rim 0..9 + rim cycle → 10 triangles; the hub
    // is the degree-skew case the ordering exists for
    val wheel = (0L until 10L).map(i => (100L, i)) ++
      (0L until 10L).map(i => (i, (i + 1) % 10))
    assert(count(wheel) === ((11L, 20L, 10L)))
  }

  test("duplicate, reversed, and self-loop edges collapse") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (2L, 2L))
    assert(count(messy) === ((3L, 3L, 1L)))
  }

  test("seeded random graph ≡ naive driver count at any partitioning") {
    val rnd = new scala.util.Random(43)
    val n = 60
    val edges = Seq.fill(400)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    val canon = edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.distinct
    val set = canon.toSet
    val verts = canon.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    var naive = 0L
    for (i <- verts.indices; j <- (i + 1) until verts.size; k <- (j + 1) until verts.size)
      if (set((verts(i), verts(j))) && set((verts(j), verts(k))) &&
        set((verts(i), verts(k)))) naive += 1
    for (parts <- Seq(1, 7)) {
      val (nv, ne, nt) = count(edges, parts)
      assert(nv === verts.size.toLong && ne === canon.size.toLong && nt === naive,
        s"parts=$parts got ($nv,$ne,$nt) want (${verts.size},${canon.size},$naive)")
    }
  }
}
