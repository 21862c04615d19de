package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class Ev(user: String, ts: java.sql.Timestamp)

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def t(min: Long) = new java.sql.Timestamp(min * 60000L)

  // u1: events at 0,10 min (one session), then 50,55 (second session);
  // u2: single event
  private val evs = Seq(
    Ev("u1", t(0)), Ev("u1", t(10)), Ev("u1", t(50)), Ev("u1", t(55)), Ev("u2", t(5)))

  private val expected = Set(
    ("u1", 2L, t(0), t(10), 600000000L),
    ("u1", 2L, t(50), t(55), 300000000L),
    ("u2", 1L, t(5), t(5), 0L))

  test("batch sessionization: 30-min gap splits sessions") {
    val out = Sessionize.sessions(evs.toDF("user", "ts"), "ts", Seq("user"))
      .as[(String, Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSet
    assert(out === expected)
  }

  test("streaming session_window across triggers matches the batch sessions") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = Sessionize.sessions(input.toDF().withColumnRenamed("user", "user"), "ts", Seq("user"))
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // first trigger: only the early events; session stays open
      input.addData(Ev("u1", t(0)), Ev("u2", t(5)))
      q.processAllAvailable()
      // second trigger: u1's 10-min event MERGES into the open session;
      // then late-hour events advance the watermark past session close
      input.addData(Ev("u1", t(10)), Ev("u1", t(50)), Ev("u1", t(55)))
      q.processAllAvailable()
      // watermark-advancing flush event (append mode emits only closed sessions)
      input.addData(Ev("u3", t(600)))
      q.processAllAvailable()
      val out = spark.table("sess_out")
        .as[(String, Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSet
      assert(out === expected)
    } finally q.stop()
  }
}
