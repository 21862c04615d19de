package graft.operators

import graft.SparkSpec

/** [[LineDedup.removeBoilerplate]] — CCNet-style boilerplate line
  * removal. The q89 gate covers the corpus-scale path; these pin the
  * semantics the oracle fixture can't isolate: DOCUMENT frequency
  * (within-doc repeats count once), all-boilerplate docs surviving as
  * empty text, and order preservation through the array_sort
  * reassembly.
  */
class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  test("df is per-document: a line repeated within ONE doc is not boilerplate") {
    val df = Seq(
      (1L, "unique one\nrepeat me\nrepeat me"), // repeat within a single doc
      (2L, "unique two"),
      (3L, "unique three")).toDF("id", "text")
    val out = LineDedup.removeBoilerplate(df, "id", "text", maxDf = 1)
      .orderBy("id")
      .select("id", "n_kept", "n_removed", "cleaned")
      .as[(Long, Long, Long, String)].collect().toSeq
    // df("repeat me") = 1 document <= maxDf, so it survives both times
    assert(out(0) === ((1L, 3L, 0L, "unique one\nrepeat me\nrepeat me")))
    assert(out(1) === ((2L, 1L, 0L, "unique two")))
  }

  test("boilerplate above maxDf is stripped; all-boilerplate doc survives empty") {
    val boiler = "subscribe now"
    val df = Seq(
      (1L, s"keep a\n$boiler\nkeep b"),
      (2L, s"$boiler\nkeep c"),
      (3L, boiler), // nothing survives
      (4L, s"keep d\n$boiler")).toDF("id", "text")
    val out = LineDedup.removeBoilerplate(df, "id", "text", maxDf = 3)
      .orderBy("id")
      .select("id", "n_kept", "n_removed", "cleaned")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out(0) === ((1L, 2L, 1L, "keep a\nkeep b"))) // order preserved
    assert(out(1) === ((2L, 1L, 1L, "keep c")))
    assert(out(2) === ((3L, 0L, 1L, ""))) // empty, not vanished
    assert(out(3) === ((4L, 1L, 1L, "keep d")))
  }

  test("reassembly order is deterministic under repartitioning") {
    val n = 40
    val rows = (0L until n).map(i => (i, (0 until 12).map(j => s"line $i $j").mkString("\n")))
    val out = LineDedup.removeBoilerplate(
        rows.toDF("id", "text").repartition(7), "id", "text", maxDf = 5)
      .select("id", "cleaned").as[(Long, String)].collect().toMap
    (0L until n).foreach { i =>
      assert(out(i) === (0 until 12).map(j => s"line $i $j").mkString("\n"))
    }
  }
}
