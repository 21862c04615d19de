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

  test("property: exact at observations, monotone between two observations (seeded)") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val obsDays = Seq(1, 4, 7).map(d => (sqlDate(f"2024-01-$d%02d"), rnd.nextDouble() * 100))
      val out = Interpolate.onto(spine, obsDays.toDF("d", "v"), "d", Seq("v"))
        .orderBy("d").select("v").as[Option[Double]].collect().toSeq
      // exact at obs (days 1,4,7 are indices 0,3,6)
      assert(out(0).get === obsDays(0)._2)
      assert(out(3).get === obsDays(1)._2)
      assert(out(6).get === obsDays(2)._2)
      // monotone between each pair of observations
      for (Seq((i0, v0), (i1, v1)) <- Seq((0, obsDays(0)._2), (3, obsDays(1)._2), (6, obsDays(2)._2)).sliding(2)) {
        val seg = (i0 to i1).map(out(_).get)
        val monotone = if (v1 >= v0) seg.sliding(2).forall(p => p(1) >= p(0) - 1e-12)
                       else seg.sliding(2).forall(p => p(1) <= p(0) + 1e-12)
        assert(monotone, s"segment $seg not monotone between $v0 and $v1")
      }
    }
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

  test("seeded random ≡ reference linear interpolation (forward limit)") {
    val rnd = new scala.util.Random(23)
    val n = 60
    val days = (0 until n).map(i =>
      java.sql.Date.valueOf(java.time.LocalDate.of(2024, 3, 1).plusDays(i)))
    val sp = days.toDF("d")
    val obsIdx = (0 until n).filter(_ => rnd.nextDouble() < 0.25)
    val obsVal = obsIdx.map(i => i -> math.floor(rnd.nextDouble() * 1000) / 10).toMap
    val obs = obsIdx.map(i => (days(i), obsVal(i))).toDF("d", "v")
    val out = Interpolate.onto(sp, obs, "d", Seq("v"))
      .orderBy("d").select("v").as[Option[Double]].collect().toSeq
    // reference: null before first obs, exact at obs, linear between,
    // held after last — computed independently index-by-index
    val expected = (0 until n).map { i =>
      val prev = obsIdx.filter(_ <= i).lastOption
      val next = obsIdx.find(_ >= i)
      (prev, next) match {
        case (None, _) => None
        case (Some(p), None) => Some(obsVal(p))
        case (Some(p), Some(q)) if p == q => Some(obsVal(p))
        case (Some(p), Some(q)) =>
          Some(obsVal(p) + (obsVal(q) - obsVal(p)) * (i - p).toDouble / (q - p).toDouble)
      }
    }
    out.zip(expected).zipWithIndex.foreach { case ((a, e), i) =>
      (a, e) match {
        case (None, None) =>
        case (Some(x), Some(y)) => assert(math.abs(x - y) < 1e-9, s"day $i: $x vs $y")
        case _ => fail(s"day $i: $a vs $e")
      }
    }
  }
}
