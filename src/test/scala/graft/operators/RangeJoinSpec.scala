package graft.operators

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("point-in-interval: inclusive bounds, exactly-once across bins") {
    val points = Seq(
      ("u1", 100L, "p100"), ("u1", 150L, "p150"), ("u1", 201L, "p201"),
      ("u2", 150L, "q150"),
    ).toDF("user", "t", "pid")
    // [100,200] spans 3 bins at width 50 — p150 must appear ONCE;
    // bounds inclusive at both ends; u2 interval empty (hi < lo)
    val intervals = Seq(
      ("u1", 100L, 200L, "i1"),
      ("u2", 500L, 400L, "bad"),
    ).toDF("user", "lo", "hi", "iid")
    val out = RangeJoin.pointInInterval(points, intervals,
        Seq("user"), "t", "lo", "hi", binWidth = 50L)
      .select("iid", "pid").as[(String, String)].collect().toSeq.sorted
    assert(out === Seq(("i1", "p100"), ("i1", "p150")))
  }

  test("keys partition the match space") {
    val points = Seq(("a", 10L), ("b", 10L)).toDF("k", "t")
    val intervals = Seq(("a", 0L, 20L)).toDF("k", "lo", "hi")
    val out = RangeJoin.pointInInterval(points, intervals,
        Seq("k"), "t", "lo", "hi", binWidth = 100L)
      .select("k").as[String].collect().toSeq
    assert(out === Seq("a"))
  }

  test("seeded random ≡ naive theta join, several bin widths") {
    val rnd = new scala.util.Random(7)
    val points = Seq.fill(300)((s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, rnd.nextInt(100000)))
      .toDF("k", "t", "pid")
    val intervals = Seq.fill(60) {
      val lo = rnd.nextInt(1000).toLong
      (s"k${rnd.nextInt(5)}", lo, lo + rnd.nextInt(120) - 10, rnd.nextInt(100000)) // some hi < lo
    }.toDF("k", "lo", "hi", "iid")
    val naive = points.join(intervals, Seq("k"))
      .filter($"t".between($"lo", $"hi"))
      .select("iid", "pid").as[(Int, Int)].collect().toSeq.sorted
    for (width <- Seq(7L, 64L, 1024L)) {
      val binned = RangeJoin.pointInInterval(points, intervals,
          Seq("k"), "t", "lo", "hi", binWidth = width)
        .select("iid", "pid").as[(Int, Int)].collect().toSeq.sorted
      assert(binned === naive, s"binWidth=$width")
    }
  }
}
