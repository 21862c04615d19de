package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class StreamDoc(doc_id: Long, ts: java.sql.Timestamp, text: String)

class StreamingContaminationSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new java.sql.Timestamp(s * 1000L)
  private val bench = Seq((100L, "alpha beta gamma delta epsilon"))

  test("streaming contamination: flags across triggers, one row per doc") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamDoc]
    val q = StreamingContamination.contaminatedIds(
        input.toDF(), "doc_id", "ts", "text",
        bench.toDF("doc_id", "text"), "text", windowTokens = 4)
      .writeStream.format("memory").queryName("contam_out")
      .outputMode("append").start()
    try {
      // doc 1 contains the window "alpha beta gamma delta" twice over
      // two triggers — must be emitted exactly once; doc 2 is clean
      input.addData(
        StreamDoc(1L, t(10), "intro alpha beta gamma delta outro"),
        StreamDoc(2L, t(11), "totally unrelated clean text here"))
      q.processAllAvailable()
      input.addData(
        StreamDoc(1L, t(20), "alpha beta gamma delta epsilon tail"),
        StreamDoc(3L, t(21), "beta gamma delta epsilon closing"))
      q.processAllAvailable()
      val out = spark.table("contam_out").select("doc_id").as[Long].collect().toSeq.sorted
      assert(out === Seq(1L, 3L))
    } finally q.stop()
  }

  test("batch fallback: same contaminated id set as the batch operator") {
    val docs = Seq(
      StreamDoc(1L, t(10), "intro alpha beta gamma delta outro"),
      StreamDoc(2L, t(11), "clean text entirely different")).toDF()
    val out = StreamingContamination.contaminatedIds(
        docs, "doc_id", "ts", "text",
        bench.toDF("doc_id", "text"), "text", windowTokens = 4)
      .select("doc_id").as[Long].collect().toSeq
    assert(out === Seq(1L))
  }
}
