package graft.operators

import graft.SparkSpec

/** Boilerplate.stripHostBoilerplate (host-scoped template removal). */
class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, String)], frac: Double = 0.5) =
    Boilerplate.stripHostBoilerplate(
        rows.toDF("id", "host", "text"), "id", "host", "text", frac)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_lines"), r.getAs[Long]("n_boiler"),
          r.getAs[String]("clean_text")))).toMap

  test("universal host template is stripped, unique bodies survive") {
    val rows = Seq(
      (1L, "a", "nav\nbody one\nfooter"),
      (2L, "a", "nav\nbody two\nfooter"),
      (3L, "a", "nav\nbody three\nfooter"))
    val out = run(rows)
    assert(out(1L) === ((3L, 2L, "body one")))
    assert(out(2L) === ((3L, 2L, "body two")))
    assert(out(3L) === ((3L, 2L, "body three")))
  }

  test("frequency is per HOST: the same line survives on a host where it is rare") {
    val rows = Seq(
      (1L, "a", "promo line\nbody 1"),
      (2L, "a", "promo line\nbody 2"),
      (6L, "a", "promo line\nbody 6"),
      (3L, "b", "promo line\nbody 3"),
      (4L, "b", "body 4\nother"),
      (5L, "b", "body 5\nmore"))
    val out = run(rows)
    // host a: promo in 3/3 docs -> stripped; host b: 1/3 -> kept
    assert(out(1L) === ((2L, 1L, "body 1")))
    assert(out(3L) === ((2L, 0L, "promo line\nbody 3")))
  }

  test("threshold boundary: exactly minDocFrac strips (>=)") {
    val rows = Seq(
      (1L, "a", "half line\nu1"),
      (2L, "a", "half line\nu2"),
      (3L, "a", "u3\nu3b"),
      (4L, "a", "u4\nu4b"))
    val out = run(rows) // half line in 2/4 = 0.5 >= 0.5 -> stripped
    assert(out(1L) === ((2L, 1L, "u1")))
    assert(out(3L) === ((2L, 0L, "u3\nu3b")))
  }

  test("doc with every line boilerplate empties cleanly") {
    val rows = Seq(
      (1L, "a", "nav\nfooter"),
      (2L, "a", "nav\nfooter"),
      (3L, "a", "nav\nbody\nfooter"))
    val out = run(rows)
    assert(out(1L) === ((2L, 2L, "")))
    assert(out(3L) === ((3L, 2L, "body")))
  }

  test("incremental strip against the stored index equals from-scratch") {
    val base = Seq(
      (1L, "a", "nav\nbody one\nfooter"),
      (2L, "a", "nav\nbody two\nfooter"),
      (3L, "a", "nav\nbody three\nfooter"),
      (4L, "b", "menu\nbeta 4"),
      (5L, "b", "menu\nbeta 5"),
      (6L, "b", "menu\nbeta 6")).toDF("id", "host", "text")
    val delta = Seq(
      (11L, "a", "nav\nbody eleven\nfooter\npromo"),
      (12L, "a", "nav\nbody twelve\nfooter\npromo"),
      (13L, "b", "menu\nbeta thirteen"),
      (14L, "c", "fresh host\nno history")).toDF("id", "host", "text")
    val inc = Boilerplate.stripIncremental(delta,
        Boilerplate.lineDfIndex(base, "id", "host", "text"),
        Boilerplate.hostDocCounts(base, "id", "host"),
        "id", "host", "text", minDocFrac = 0.5)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    val scratch = Boilerplate.stripHostBoilerplate(
        base.unionByName(delta), "id", "host", "text", minDocFrac = 0.5)
      .filter($"id" >= 11L)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(inc === scratch)
    // promo: 2 of 5 host-a docs = 0.4 < 0.5 -> kept; nav: 5/5 -> gone
    assert(inc(11L) === "body eleven\npromo")
    // fresh host with one doc: every line is 1/1 >= 0.5 -> all boiler
    assert(inc(14L) === "")
  }

  test("kept lines preserve original order") {
    // frac 0.6: 'common' (2/2 = 1.0) strips, uniques (0.5) survive
    val rows = Seq(
      (1L, "a", "x\ncommon\ny\ncommon\nz"),
      (2L, "a", "common\nq"))
    val out = run(rows, frac = 0.6)
    assert(out(1L)._3 === "x\ny\nz")
  }
}
