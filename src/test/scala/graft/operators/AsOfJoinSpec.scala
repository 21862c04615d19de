package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.max

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

  test("seeded random as-of ≡ naive latest-at-or-before join") {
    val rnd = new scala.util.Random(17)
    val trades = Seq.tabulate(300)(i => (s"s${rnd.nextInt(6)}", rnd.nextInt(500).toLong, i))
      .toDF("sym", "t", "tid")
    val quotes = Seq.fill(200)((s"s${rnd.nextInt(6)}", rnd.nextInt(500).toLong))
      .zipWithIndex.map { case ((s, t), i) => (s, t, i * 1.0) }
      .toDF("sym", "t", "px")
      // one quote per (sym, t): the naive reference below picks max-t
      // only, so in-tie winners must be unique to compare
      .groupBy("sym", "t").agg(max("px").as("px"))
    val swept = AsOfJoin.backward(trades, quotes, Seq("sym"), "t", "t", Seq("px"))
      .select("tid", "px").as[(Int, Option[Double])].collect().toMap
    val qs = quotes.as[(String, Long, Double)].collect()
    val naive = trades.as[(String, Long, Int)].collect().map { case (s, t, tid) =>
      val cand = qs.filter(q => q._1 == s && q._2 <= t)
      tid -> (if (cand.isEmpty) None else Some(cand.maxBy(_._2)._3))
    }.toMap
    assert(swept === naive)
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
