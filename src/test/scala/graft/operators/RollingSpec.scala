package graft.operators

import graft.SparkSpec

class RollingSpec extends SparkSpec {
  import spark.implicits._

  private def df(vals: Double*) = vals.zipWithIndex.map { case (v, i) =>
    ("a", java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)), v)
  }.toDF("k", "d", "tss")

  private def run(vals: Double*) =
    Rolling.withMonotonyStrain(df(vals: _*), "d", Seq("k"), Seq("tss" -> ""))
      .orderBy("d").select("monotony", "strain").as[(Double, Double)].collect().toSeq

  test("first row (1-row frame): monotony and strain are 0 (SURVEY Q6)") {
    val out = run(100.0, 110.0)
    assert(out.head === ((0.0, 0.0)))
    assert(out(1)._1 > 0)
  }

  test("constant series: stddev clips to 0.01 (pandas clip(lower=0.01))") {
    val out = run(50.0, 50.0, 50.0)
    // rows 2,3: mean=50, std=0 → clip 0.01 → monotony = 5000
    assert(math.abs(out(1)._1 - 5000.0) < 1e-9)
    assert(math.abs(out(1)._2 - 100.0 * 5000.0) < 1e-6)
    assert(math.abs(out(2)._2 - 150.0 * 5000.0) < 1e-6)
  }

  test("7-row frame matches pandas rolling(7) semantics") {
    val vals = Seq(10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0, 80.0, 90.0)
    val out = run(vals: _*)
    // row 8 (idx 8): window = vals(2..8), mean=60, std=sqrt(variance ddof=1)
    val win = vals.slice(2, 9)
    val mean = win.sum / 7
    val std = math.sqrt(win.map(v => (v - mean) * (v - mean)).sum / 6)
    assert(math.abs(out(8)._1 - mean / std) < 1e-9)
    assert(math.abs(out(8)._2 - win.sum * (mean / std)) < 1e-6)
  }
}
