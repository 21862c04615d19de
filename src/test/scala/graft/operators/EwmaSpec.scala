package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EwmaSpec extends SparkSpec {
  import spark.implicits._

  private def series(keys: Seq[String], n: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    for {
      k <- keys
      i <- 0 until n
    } yield (k, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
      math.floor(rnd.nextDouble() * 1000) / 10)
  }

  test("fold matches hand-computed recurrence") {
    val df = Seq(
      ("a", sqlDate("2024-01-01"), 100.0),
      ("a", sqlDate("2024-01-02"), 0.0),
      ("a", sqlDate("2024-01-03"), 50.0),
    ).toDF("k", "d", "tss")
    val out = Ewma.withTrainingLoad(df, "d", Seq("k"), Seq("tss" -> ""))
      .orderBy("d").select("ctl", "atl", "tsb").as[(Double, Double, Double)].collect()
    var ctl = 0.0; var atl = 0.0
    val exp = Seq(100.0, 0.0, 50.0).map { v =>
      ctl = v * Ewma.CtlImpact + ctl * Ewma.CtlDecay
      atl = v * Ewma.AtlImpact + atl * Ewma.AtlDecay
      (ctl, atl, ctl - atl)
    }
    assert(out.toSeq === exp) // bit-exact: same fold, same order
  }

  test("fold ≡ closed form within 1e-9 on random series (property)") {
    for (seed <- 1L to 5L) {
      val data = series(Seq("x", "y"), 60, seed)
      val df = data.toDF("k", "d", "tss")
      val out = Ewma.withTrainingLoad(df, "d", Seq("k"), Seq("tss" -> ""))
        .orderBy("k", "d").select("k", "ctl").as[(String, Double)].collect()
      for (key <- Seq("x", "y")) {
        val vals = data.filter(_._1 == key).sortBy(_._2.toString).map(_._3)
        val closed = Ewma.closedForm(vals, Ewma.CtlImpact, Ewma.CtlDecay)
        val got = out.filter(_._1 == key).map(_._2).toSeq
        got.zip(closed).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
      }
    }
  }

  test("groups fold independently and dates sort within groups") {
    // rows arrive date-shuffled; group b has different values than a
    val df = Seq(
      ("a", sqlDate("2024-01-02"), 10.0),
      ("b", sqlDate("2024-01-01"), 7.0),
      ("a", sqlDate("2024-01-01"), 5.0),
    ).toDF("k", "d", "tss")
    val out = Ewma.withTrainingLoad(df, "d", Seq("k"), Seq("tss" -> ""))
      .orderBy("k", "d").select("k", "ctl").as[(String, Double)].collect().toSeq
    assert(out(0)._2 === 5.0 * Ewma.CtlImpact)
    assert(out(1)._2 === 10.0 * Ewma.CtlImpact + 5.0 * Ewma.CtlImpact * Ewma.CtlDecay)
    assert(out(2)._2 === 7.0 * Ewma.CtlImpact)
  }

  test("withTrainingLoadSorted ≡ withTrainingLoad after a window pass (bit-identical)") {
    for (seed <- 1L to 3L) {
      val df = series(Seq("x", "y", "z"), 40, seed).toDF("k", "d", "tss")
      // the production layout: a rolling-window pass leaves the frame
      // hash-partitioned by key and sorted by (key, date)
      val windowed = Rolling.withMonotonyStrain(df, "d", Seq("k"), Seq("tss" -> ""))
      val sorted = Ewma.withTrainingLoadSorted(windowed, "d", Seq("k"), Seq("tss" -> ""))
        .select("k", "d", "ctl", "atl", "tsb")
        .orderBy("k", "d").collect().toSeq
      val grouped = Ewma.withTrainingLoad(windowed, "d", Seq("k"), Seq("tss" -> ""))
        .select("k", "d", "ctl", "atl", "tsb")
        .orderBy("k", "d").collect().toSeq
      assert(sorted === grouped)
    }
  }

  test("null inputs contribute 0 (gap rows)") {
    val df = Seq(
      ("a", sqlDate("2024-01-01"), Some(100.0)),
      ("a", sqlDate("2024-01-02"), None),
    ).toDF("k", "d", "tss")
    val out = Ewma.withTrainingLoad(df, "d", Seq("k"), Seq("tss" -> ""))
      .orderBy("d").select("ctl").as[Double].collect()
    assert(out(1) === out(0) * Ewma.CtlDecay)
  }
}
