package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class Doc(ts: java.sql.Timestamp, text: String)

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("streaming exact dedup: one row per content hash across triggers") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingDedup.exactByHash(input.toDF(), "ts", "text")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(Doc(t(10), "alpha"), Doc(t(11), "beta"), Doc(t(12), "alpha"))
      q.processAllAvailable()
      // a later trigger re-delivers "beta" within the horizon: dropped
      input.addData(Doc(t(20), "beta"), Doc(t(21), "gamma"))
      q.processAllAvailable()
      val out = spark.table("dedup_out").select("text").as[String].collect().toSeq.sorted
      assert(out === Seq("alpha", "beta", "gamma"))
    } finally q.stop()
  }

  test("batch fallback: deterministic first-wins by timestamp") {
    val df = Seq(Doc(t(30), "x"), Doc(t(10), "x"), Doc(t(20), "y")).toDF()
    val out = StreamingDedup.exactByHash(df, "ts", "text")
      .select("ts", "text").as[(java.sql.Timestamp, String)].collect().toSet
    assert(out === Set((t(10), "x"), (t(20), "y")))
  }
}
