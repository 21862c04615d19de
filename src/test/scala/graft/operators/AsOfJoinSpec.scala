package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("backward as-of: latest right row at-or-before each left time, per key") {
    val trades = Seq(("A", 3L, "t1"), ("A", 7L, "t2"), ("B", 5L, "t3"), ("A", 1L, "t4"))
      .toDF("sym", "t", "trade")
    val quotes = Seq(("A", 2L, 10.0), ("A", 7L, 11.0), ("B", 9L, 20.0))
      .toDF("sym", "t", "px")
    val out = AsOfJoin.backward(trades, quotes, Seq("sym"), "t", "t", Seq("px"))
      .select("trade", "px").as[(String, Option[Double])].collect().toMap
    assert(out("t4") === None)        // before first quote
    assert(out("t1") === Some(10.0))  // quote at t=2
    assert(out("t2") === Some(11.0))  // tie (t=7) matches — inclusive
    assert(out("t3") === None)        // B has no quote ≤ 5
  }

  test("right rows tied on (key, time) resolve deterministically at any partitioning") {
    // two quotes share (A, 5): the value-struct tiebreak must pick the
    // max (99.0) regardless of input order or parallelism
    val trades = Seq(("A", 6L, "t1")).toDF("sym", "t", "trade")
    for (quotes <- Seq(
        Seq(("A", 5L, 99.0), ("A", 5L, 11.0)),
        Seq(("A", 5L, 11.0), ("A", 5L, 99.0)))) {
      val q = quotes.toDF("sym", "t", "px").repartition(4)
      val out = AsOfJoin.backward(trades, q, Seq("sym"), "t", "t", Seq("px"))
        .select("px").as[Double].head()
      assert(out === 99.0)
    }
  }
}
