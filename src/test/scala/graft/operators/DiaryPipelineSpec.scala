package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden end-to-end fixture (SURVEY.md §5.4): the full diary pipeline
  * on a hand-written mini TrainingDiary.json, asserting hand-computed
  * values per stage semantics.
  */
class DiaryPipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val wh = {
    val path = getClass.getResource("/TrainingDiary.json").getPath
    DiaryPipeline.build(spark, path).cache()
  }

  private def cell(a: String, at: String, e: String) =
    wh.filter($"activity" === a && $"activity_type" === at && $"equipment" === e)

  test("full spine × combos: every cell has a row for every day") {
    // combos: Run_Road_ShoesA + 5 aggregated supersets of day1,
    // day3 Bike (Not Set dropped from equipment-bearing sets): Bike_Turbo_All,
    // Bike_All_All, All_Turbo_All, All_All_All (already counted),
    // day4: Run_Trail_ShoesB, Bike_Road_Bike1 + their supersets…
    val combos = wh.select("activity", "activity_type", "equipment").distinct().count()
    val days = wh.select("date").distinct().count()
    assert(days === 4)
    assert(wh.count() === combos * days)
  }

  test("same-day same-key workouts aggregate: sums + duration-weighted means") {
    val r = cell("Run", "Road", "ShoesA").filter($"date" === sqlDate("2020-01-01"))
      .select("km", "miles", "tss", "rpe", "hr", "seconds", "minutes", "is_race", "rpe_tss", "mph")
      .as[(Double, Double, Long, Double, Long, Long, Long, Boolean, Double, Double)].head()
    assert(r._1 === 15.0)                       // km summed
    assert(r._2 === bd(15.0 * 0.621371, 2))     // miles: rounded at write
    assert(r._3 === 90L)                        // tss summed, int
    // rpe weighted: (6*3600 + 8*1800)/5400 = 6.666…
    assert(math.abs(r._4 - bd((6.0 * 3600 + 8 * 1800) / 5400, 2)) < 1e-12)
    assert(r._5 === 143L)                       // hr weighted 143.33 → int() trunc
    assert(r._6 === 5400L)
    assert(r._7 === 90L)                        // minutes = round(5400/60)
    assert(r._8 === true)                       // bool-or
    // mapper-after-aggregate: rpe from weighted mean, seconds total
    val rpeW = (6.0 * 3600 + 8 * 1800) / 5400
    assert(r._9 === bd(bd1(rpeW * rpeW * 5400 / (49 * 36)), 2))
    assert(r._10 === bd(bd1(15.0 * 0.621371 * 3600 / 5400), 2))
  }

  test("'Not Set' equipment: excluded from equipment-bearing cells only") {
    assert(cell("Bike", "Turbo", "NotSet").count() === 0)
    val all = cell("Bike", "Turbo", "All").filter($"date" === sqlDate("2020-01-03"))
      .select("tss").as[Long].head()
    assert(all === 45L) // still aggregated into equipment='All' cells
  }

  test("gap rows carry the day's REAL values and workout zeros") {
    val gap = cell("Run", "Road", "ShoesA").filter($"date" === sqlDate("2020-01-02"))
      .select("tss", "km", "fatigue", "day_type", "is_race")
      .as[(Long, Double, Double, String, Boolean)].head()
    assert(gap === ((0L, 0.0, 5.0, "Rest", false)))
  }

  test("EWMA ctl/atl/tsb fold over the all-All cell") {
    val tss = cell("All", "All", "All").orderBy("date").select("tss").as[Long].collect()
    assert(tss.toSeq === Seq(90L, 0L, 45L, 125L))
    val got = cell("All", "All", "All").orderBy("date").select("ctl").as[Double].collect()
    var ctl = 0.0
    val exp = tss.map { v => ctl = v * Ewma.CtlImpact + ctl * Ewma.CtlDecay; ctl }
    assert(got.toSeq === exp.toSeq)
  }

  test("rolling monotony: first row 0, later rows mean/clipped-std") {
    val m = cell("All", "All", "All").orderBy("date").select("monotony").as[Double].collect()
    assert(m(0) === 0.0) // 1-row frame → NaN → 0 (SURVEY Q6)
    val w = Seq(90.0, 0.0)
    val mean = w.sum / 2
    val sd = math.sqrt(w.map(x => (x - mean) * (x - mean)).sum / 1)
    assert(math.abs(m(1) - mean / sd) < 1e-12)
  }

  test("physio interpolation: exact at obs, linear between, ffill after, 0 before") {
    val rows = cell("All", "All", "All").orderBy("date")
      .select("kg", "lbs", "resting_hr", "rmssd")
      .as[(Double, Double, Double, Double)].collect().toSeq
    assert(rows(0)._1 === 70.0)  // kg rounded 1dp from 70.04→70.0 input round
    assert(rows(1)._1 === 70.3)  // linear midpoint (70.0+70.6)/2
    assert(rows(2)._1 === 70.6)
    assert(rows(3)._1 === 70.6)  // ffill after last obs
    assert(rows(1)._2 === bd1(70.3 * 2.20462)) // lbs from unrounded interp
    assert(rows(0)._3 === 0.0)   // hr before first obs → 0
    assert(rows(1)._3 === 48.0)
    assert(rows(2)._3 === 49.0)  // interpolated
    // Q3 fixed: rmssd interpolates RMSSD values, not SDNN
    assert(rows(1)._4 === 40.3)
    assert(rows(3)._4 === 42.0)
  }

  test("catalog derives from dims; calendar attrs present") {
    assert(DiaryPipeline.catalog(wh).count() ===
      wh.select("activity", "activity_type", "equipment").distinct().count())
    val cal = wh.filter($"date" === sqlDate("2020-01-01"))
      .select("year_week", "year_month", "day_of_week", "month").distinct()
      .as[(String, String, String, String)].head()
    assert(cal === (("2020-1", "2020-Jan", "Wed", "Jan")))
  }

  test("pipeline plan shape: cube cached for its three consumers, no wide-row SMJ") {
    val path = getClass.getResource("/TrainingDiary.json").getPath
    val plan = DiaryPipeline.build(spark, path)
      .queryExecution.executedPlan.toString()
    // the aggregated cube feeds facts, the combo enumeration AND the
    // gap-key anti-join — it must come from cache, not three
    // re-executions of the scan→project→cube subtree
    val cachedReads = plan.linesIterator.count(_.contains("InMemoryTableScan"))
    assert(cachedReads >= 3, s"expected >=3 cached cube reads, got $cachedReads")
    // gap fill is union-of-missing (key-only anti-join + union), never
    // a sort-merge join that would exchange+sort every wide fact row
    assert(!plan.contains("SortMergeJoin"),
      "gap fill must not degrade to a sort-merge join")
    assert(plan.contains("Union"), "gap fill should union missing rows")
  }

  test("weekly rollup: SUM sums, MEAN plain-averages, booleans count") {
    val wk = DiaryPipeline.rollup(wh, "Week")
    val r = wk.filter($"activity" === "All" && $"activity_type" === "All" &&
        $"equipment" === "All" && $"year_week" === "2020-1")
      .select("tss", "fatigue", "is_race", "date")
      .as[(Double, Double, Long, java.sql.Date)].head()
    assert(r._1 === 260.0)              // 90+0+45+125
    assert(r._2 === 3.5)                // plain AVG(3,5,4,2), not weighted
    assert(r._3 === 1L)                 // race count
    assert(r._4 === sqlDate("2020-01-04")) // MAX(date)
  }

  test("end-to-end determinism: two independent builds agree bit-for-bit") {
    val path = getClass.getResource("/TrainingDiary.json").getPath
    def snapshot() = DiaryPipeline.build(spark, path)
      .collect().map(_.toSeq.map {
        case d: Double => java.lang.Double.doubleToLongBits(d).toString
        case x => String.valueOf(x)
      }.mkString("|")).sorted.toSeq
    assert(snapshot() === snapshot())
  }

  test("duplicate-date day entries: FIRST day wins (reference date UNIQUE + swallowed insert)") {
    val json =
      """{"days": [
        |  {"iso8061DateString": "2021-03-01T00:00:00Z", "type": "Normal",
        |   "fatigue": 2.0, "motivation": 4.0, "sleep": 8.0, "sleepQuality": "Good",
        |   "workouts": [{"activityString": "Run", "activityTypeString": "Road",
        |     "equipmentName": "S", "km": 5.0, "tss": 30.0, "rpe": 5.0, "hr": 130.0,
        |     "watts": 0.0, "seconds": 1800.0, "ascentMetres": 0.0, "kj": 0.0,
        |     "reps": 0.0, "isRace": 0.0, "brick": 0.0, "wattsEstimated": 0.0,
        |     "cadence": 0.0}]},
        |  {"iso8061DateString": "2021-03-01T00:00:00Z", "type": "Rest",
        |   "fatigue": 9.0, "motivation": 1.0, "sleep": 4.0, "sleepQuality": "Poor",
        |   "workouts": [{"activityString": "Run", "activityTypeString": "Road",
        |     "equipmentName": "S", "km": 99.0, "tss": 500.0, "rpe": 9.0, "hr": 180.0,
        |     "watts": 0.0, "seconds": 3600.0, "ascentMetres": 0.0, "kj": 0.0,
        |     "reps": 0.0, "isRace": 0.0, "brick": 0.0, "wattsEstimated": 0.0,
        |     "cadence": 0.0}]}
        |], "weights": [], "physiologicals": []}""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("dupday")
    val p = dir.resolve("diary.json")
    java.nio.file.Files.write(p, json.getBytes("UTF-8"))
    val w = DiaryPipeline.build(spark, p.toString)
    val r = w.filter($"activity" === "Run" && $"activity_type" === "Road" && $"equipment" === "S")
      .select("km", "fatigue", "day_type").as[(Double, Double, String)].head()
    // first entry's workout AND day values; the duplicate's 99 km /
    // fatigue 9 'Rest' day never reaches the cube or the dayVals join
    assert(r === ((5.0, 2.0, "Normal")))
    assert(w.select("date").distinct().count() === 1)
  }

  private def bd(x: Double, s: Int): Double =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_EVEN).toDouble
  private def bd1(x: Double): Double = bd(x, 1)
}
