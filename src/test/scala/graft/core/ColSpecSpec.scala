package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ColSpecSpec extends SparkSpec {
  import spark.implicits._

  test("project applies factor without rounding (round-at-write only)") {
    // two 90-second workouts: reference stores minutes=3 for the
    // aggregated day (round once at write), NOT round(1.5)+round(1.5)=4
    val spec = ColSpec("seconds", "minutes", LongType, factor = 1.0 / 60)
    val df = Seq(90.0, 90.0).toDF("seconds")
    val summed = df.select(spec.project($"seconds").as("minutes"))
      .agg(spec.aggregate(lit(1)).as("minutes"))
      .select(spec.finalize($"minutes").as("minutes"))
    assert(summed.as[Long].head() === 3L)
  }

  test("weightedMean is duration-weighted and 0 on zero weight sum") {
    val df = Seq((10.0, 60.0), (20.0, 120.0)).toDF("v", "w")
    val wm = df.agg(Exact.weightedMean($"v", $"w").as("m")).as[Double].head()
    assert(math.abs(wm - (10 * 60 + 20 * 120) / 180.0) < 1e-12)
    val zero = Seq((10.0, 0.0)).toDF("v", "w")
      .agg(Exact.weightedMean($"v", $"w").as("m")).as[Double].head()
    assert(zero === 0.0) // SURVEY.md Q5: reference crashes, we emit 0
  }

  test("weighted-mean INTEGER columns truncate (reference int())") {
    val spec = ColSpec("hr", "hr", LongType, agg = AggMethod.WeightedMean)
    val df = Seq((150.0, 60.0), (155.0, 60.0)).toDF("hr", "w")
    // weighted mean = 152.5 → int() truncation → 152
    val v = df.agg(spec.aggregate($"w")).as[Double].head()
    assert(v === 152.0)
  }

  test("BoolOr: any true wins; all-null group is false") {
    val spec = ColSpec("is_race", "is_race", BooleanType, agg = AggMethod.BoolOr)
    val t = Seq(Some(false), Some(true), None).toDF("is_race")
      .agg(spec.aggregate(lit(1))).as[Boolean].head()
    assert(t === true)
    val n = Seq[Option[Boolean]](None, None).toDF("is_race")
      .agg(spec.aggregate(lit(1))).as[Boolean].head()
    assert(n === false)
  }

  test("dsum is exact (decimal) and order-independent") {
    val vals = Seq.fill(1000)(0.1)
    val a = vals.toDF("v").repartition(7).agg(Exact.dsum($"v")).as[Double].head()
    assert(a === 100.0) // double fold would give 100.00000000000007…
  }

  test("property: weighted mean bounded by min/max of inputs (seeded)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val rows = Seq.fill(50)((rnd.nextDouble() * 200, rnd.nextInt(5000) + 1.0))
      val wm = rows.toDF("v", "w").agg(Exact.weightedMean($"v", $"w")).as[Double].head()
      assert(wm >= rows.map(_._1).min - 1e-9 && wm <= rows.map(_._1).max + 1e-9)
    }
  }

  test("finalize rounds REAL to 2dp banker's and INTEGER via round+cast") {
    val spec = ColSpec("km", "km", DoubleType)
    val r = Seq(1.005, 1.015).toDF("v").select(spec.finalize($"v").as("r"))
      .as[Double].collect()
    assert(r.toSeq === Seq(1.0, 1.02)) // bround: half-even
  }
}
