package graft.operators

import graft.SparkSpec

class InterpolateSpec extends SparkSpec {
  import spark.implicits._

  private val spine = (0 until 10).map(i =>
    java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))).toDF("d")

  test("pandas interpolate(linear) semantics: 0-ish before first, linear between, ffill after") {
    // obs at day 3 (=30) and day 6 (=60)
    val obs = Seq((sqlDate("2024-01-04"), 30.0), (sqlDate("2024-01-07"), 60.0)).toDF("d", "v")
    val out = Interpolate.onto(spine, obs, "d", Seq("v"))
      .orderBy("d").select("v").as[Option[Double]].collect().toSeq
    assert(out.take(3) === Seq(None, None, None))       // before first obs → null (sink writes 0)
    assert(out(3) === Some(30.0))                        // exact at obs
    assert(out(4) === Some(40.0))                        // linear
    assert(out(5) === Some(50.0))
    assert(out(6) === Some(60.0))
    assert(out.drop(7) === Seq(Some(60.0), Some(60.0), Some(60.0))) // ffill after last
  }

  test("single observation: held forward, null before") {
    val obs = Seq((sqlDate("2024-01-05"), 42.0)).toDF("d", "v")
    val out = Interpolate.onto(spine, obs, "d", Seq("v"))
      .orderBy("d").select("v").as[Option[Double]].collect().toSeq
    assert(out.take(4).forall(_.isEmpty))
    assert(out.drop(4).forall(_.contains(42.0)))
  }

  test("partitioned by key: series interpolate independently") {
    val spine2 = Seq("a", "b").toDF("k").crossJoin(spine)
    val obs = Seq(
      ("a", sqlDate("2024-01-01"), 0.0), ("a", sqlDate("2024-01-10"), 90.0),
      ("b", sqlDate("2024-01-01"), 100.0), ("b", sqlDate("2024-01-10"), 10.0),
    ).toDF("k", "d", "v")
    val out = Interpolate.onto(spine2, obs, "d", Seq("v"), keys = Seq("k"))
      .orderBy("k", "d").select("v").as[Double].collect().toSeq
    assert(out.take(10) === (0 until 10).map(_ * 10.0))
    assert(out.drop(10) === (0 until 10).map(100.0 - _ * 10.0))
  }
}
