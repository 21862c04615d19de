package graft.streaming

import graft.SparkSpec
import graft.operators.Ewma
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingLoadSpec extends SparkSpec {
  import spark.implicits._
  import StreamingLoad._

  test("streaming EWMA state matches the batch fold across triggers") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DailyRow]
    val q = ewma(input.toDS())
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode("append").start()
    try {
      // batch 1: two days for key a (out of order), one for b
      input.addData(DailyRow("a", 2L, 50.0), DailyRow("a", 1L, 100.0), DailyRow("b", 1L, 80.0))
      q.processAllAvailable()
      // batch 2: key a skips day 3 (gap decays), resumes day 4
      input.addData(DailyRow("a", 4L, 70.0))
      q.processAllAvailable()
      val out = spark.table("ewma_out").orderBy("key", "epochDay")
        .select("key", "ctl").as[(String, Double)].collect().toSeq
      // batch-equivalent fold for key a over days 1..4 with day-3 zero
      var ctl = 0.0
      val exp = Seq(100.0, 50.0, 0.0, 70.0).map { v =>
        ctl = v * Ewma.CtlImpact + ctl * Ewma.CtlDecay; ctl
      }
      assert(out.filter(_._1 == "a").map(_._2) === Seq(exp(0), exp(1), exp(3)))
      assert(out.filter(_._1 == "b").map(_._2) === Seq(80.0 * Ewma.CtlImpact))
    } finally q.stop()
  }

  test("streaming rolling monotony/strain matches the batch window op") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DailyRow]
    val q = rollingStrain(input.toDS())
      .writeStream.format("memory").queryName("roll_out")
      .outputMode("append").start()
    try {
      val vals = Seq(90.0, 0.0, 45.0, 125.0, 50.0, 50.0, 50.0, 80.0, 10.0)
      input.addData(vals.take(4).zipWithIndex.map { case (v, i) => DailyRow("a", i + 1, v) }: _*)
      q.processAllAvailable()
      input.addData(vals.drop(4).zipWithIndex.map { case (v, i) => DailyRow("a", i + 5, v) }: _*)
      q.processAllAvailable()
      val stream = spark.table("roll_out").orderBy("epochDay")
        .select("monotony", "strain").as[(Double, Double)].collect().toSeq
      // batch twin over the same series
      val df = vals.zipWithIndex.map { case (v, i) =>
        ("a", java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)), v)
      }.toDF("k", "d", "tss")
      val batch = graft.operators.Rolling
        .withMonotonyStrain(df, "d", Seq("k"), Seq("tss" -> ""))
        .orderBy("d").select("monotony", "strain").as[(Double, Double)].collect().toSeq
      stream.zip(batch).foreach { case ((sm, ss), (bm, bs)) =>
        assert(math.abs(sm - bm) < 1e-9 && math.abs(ss - bs) < 1e-6)
      }
    } finally q.stop()
  }

  test("late/duplicate day rows are dropped, state is unaffected") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DailyRow]
    val q = ewma(input.toDS())
      .writeStream.format("memory").queryName("ewma_late")
      .outputMode("append").start()
    try {
      input.addData(DailyRow("a", 5L, 10.0))
      q.processAllAvailable()
      input.addData(DailyRow("a", 5L, 99.0), DailyRow("a", 3L, 99.0)) // late
      q.processAllAvailable()
      val n = spark.table("ewma_late").count()
      assert(n === 1)
    } finally q.stop()
  }

  test("watermarked 1-day windowed aggregation emits day totals (streaming)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDS().toDF("ts", "event_type", "value")
    val daily = dailyAggregate(events, "ts", Seq("event_type"), "value")
    val q = daily.writeStream.format("memory").queryName("daily_out")
      .outputMode("append").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData((t("2024-01-01 10:00:00"), "run", 10.0), (t("2024-01-01 12:00:00"), "run", 20.0))
      q.processAllAvailable()
      // advance watermark past day 1's close (lateness 1 day → need ts ≥ Jan 3)
      input.addData((t("2024-01-03 00:00:01"), "run", 5.0))
      q.processAllAvailable()
      input.addData((t("2024-01-05 00:00:01"), "run", 1.0))
      q.processAllAvailable()
      val out = spark.table("daily_out").orderBy("date")
        .select("date", "tss").as[(java.sql.Date, Double)].collect().toSeq
      assert(out.head === ((sqlDate("2024-01-01"), 30.0)))
    } finally q.stop()
  }

  test("dailyAggregate on a batch frame gives the same day totals") {
    val df = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), "run", 1.5),
      (java.sql.Timestamp.valueOf("2024-01-01 23:00:00"), "run", 2.5),
    ).toDF("ts", "event_type", "value")
    val out = dailyAggregate(df, "ts", Seq("event_type"), "value")
      .select("tss").as[Double].head()
    assert(out === 4.0)
  }
}
