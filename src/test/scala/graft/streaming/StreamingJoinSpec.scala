package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class Click(click_id: Long, user_id: Long, cts: java.sql.Timestamp)
case class Err(error_id: Long, user_id: Long, ets: java.sql.Timestamp)

class StreamingJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new java.sql.Timestamp(s * 1000L)

  // clicks within 60 s preceding each error, same user
  private val clicks = Seq(
    Click(1, 100, t(100)), // joins e1 (t=130) and e2 (t=160)
    Click(2, 100, t(130)), // joins e1 (boundary: cts == ets) and e2
    Click(3, 100, t(65)),  // joins neither (130-60=70 > 65)
    Click(4, 200, t(100)), // other user: joins e3
    Click(5, 300, t(100))) // user with no errors
  private val errors = Seq(
    Err(11, 100, t(130)), Err(12, 100, t(160)), Err(13, 200, t(110)),
    Err(14, 400, t(100))) // error with no clicks
  private val expected = Set(
    (11L, 1L), (11L, 2L),
    (12L, 1L), (12L, 2L),
    (13L, 4L))

  test("stream-stream interval join emits exactly the theta-join pair set") {
    implicit val sqlCtx = spark.sqlContext
    val cIn = MemoryStream[Click]
    val eIn = MemoryStream[Err]
    val q = StreamingJoin.pointInPrecedingWindow(
        cIn.toDF(), eIn.toDF(), Seq("user_id"), "cts", "ets",
        windowSec = 60L, lateness = "1 hour")
      .select("error_id", "click_id")
      .writeStream.format("memory").queryName("sj_out")
      .outputMode("append").start()
    try {
      // deliver out of order and split across triggers: the symmetric
      // hash state must hold each side until the other arrives
      cIn.addData(clicks.take(2): _*)
      eIn.addData(errors.take(1): _*)
      q.processAllAvailable()
      cIn.addData(clicks.drop(2): _*)
      eIn.addData(errors.drop(1): _*)
      q.processAllAvailable()
      val out = spark.table("sj_out").as[(Long, Long)].collect().toSet
      assert(out === expected)
    } finally q.stop()
  }

  test("batch fallback produces the same pair set") {
    val out = StreamingJoin.pointInPrecedingWindow(
        clicks.toDF(), errors.toDF(), Seq("user_id"), "cts", "ets",
        windowSec = 60L)
      .select("error_id", "click_id").as[(Long, Long)].collect().toSet
    assert(out === expected)
  }

  test("identical timestamp column names are rejected") {
    intercept[IllegalArgumentException] {
      StreamingJoin.pointInPrecedingWindow(
        clicks.toDF().withColumnRenamed("cts", "ts"),
        errors.toDF().withColumnRenamed("ets", "ts"),
        Seq("user_id"), "ts", "ts", windowSec = 60L)
    }
  }

  test("mixed stream-static frames are rejected at plan time, both directions") {
    implicit val sqlCtx = spark.sqlContext
    val cIn = MemoryStream[Click]
    val eIn = MemoryStream[Err]
    // batch point + streaming interval: would silently take the batch
    // RangeJoin path and explode a streaming frame at runtime
    val e1 = intercept[IllegalArgumentException] {
      StreamingJoin.pointInPrecedingWindow(
        clicks.toDF(), eIn.toDF(), Seq("user_id"), "cts", "ets", windowSec = 60L)
    }
    assert(e1.getMessage.contains("isStreaming"))
    val e2 = intercept[IllegalArgumentException] {
      StreamingJoin.pointInPrecedingWindow(
        cIn.toDF(), errors.toDF(), Seq("user_id"), "cts", "ets", windowSec = 60L)
    }
    assert(e2.getMessage.contains("isStreaming"))
  }
}
