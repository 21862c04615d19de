package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CorpusStats (zipf / entropy / PMI), Snapshot diff, and SkewReport:
  * closed-form fixtures plus the partitioning-invariance property
  * every decimal-exact aggregate must satisfy.
  */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("zipfFit recovers slope -1 on an exact power-law corpus") {
    // token i appears floor(6000 / i) times, i = 1..30: an exact
    // Zipf(1) head, so the log-log OLS slope must be ~ -1
    val toks = (1 to 30).flatMap(i => Seq.fill(6000 / i)(f"t$i%03d")).toDF("tok")
    val row = CorpusStats.zipfFit(toks, "tok", topK = 30).collect().head
    assert(row.getAs[Long]("n_fit") === 30L)
    val slope = row.getAs[Double]("slope")
    assert(slope > -1.03 && slope < -0.97, s"slope $slope not ~ -1")
    assert(row.getAs[Double]("r2") > 0.999)
  }

  test("zipfFit is bit-identical across partitionings") {
    val toks = (1 to 500).map(i => s"w${i % 37}").toDF("tok")
    val a = CorpusStats.zipfFit(toks.repartition(1), "tok", 20).collect().head
    val b = CorpusStats.zipfFit(toks.repartition(7), "tok", 20).collect().head
    assert(a === b)
  }

  test("groupEntropy: uniform group hits ln k, single-value group is 0") {
    val df = (Seq.tabulate(40)(i => ("uni", s"v${i % 4}")) ++
      Seq.fill(10)(("mono", "only"))).toDF("g", "v")
    val got = CorpusStats.groupEntropy(df, "g", "v")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("mono") === (("mono", 10L, 1L, 0.0)))
    assert(got("uni")._3 === 4L)
    assert(math.abs(got("uni")._4 - math.log(4.0)) < 1e-6, s"uniform: ${got("uni")}")
  }

  test("tokenEntropy: constant doc is 0, all-distinct doc is ln n") {
    val docs = Seq(
      (1L, "a a a a a a a a"),                  // 8 copies of one token
      (2L, "a b c d e f g h"),                  // 8 distinct tokens
      (3L, "")                                   // no tokens: absent
    ).toDF("doc_id", "text")
    val out = CorpusStats.tokenEntropy(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Double]("entropy") === 0.0)
    val h2 = out(1).getAs[Double]("entropy")
    val ln8 = BigDecimal(math.log(8.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(h2 - ln8) < 1e-6, s"expected ~ln 8, got $h2")
    assert(out(1).getAs[Long]("n_distinct") === 8L)
  }

  test("pmiCollocations ranks the planted collocation first") {
    // "zx qy" always co-occur (8 times); filler tokens are frequent
    // but never adjacent to the same partner twice in a row
    val planted = Seq.fill(8)("zx qy")
    val filler = (1 to 40).map(i => s"f${i % 5} g${i % 7}")
    val docs = (planted ++ filler).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = CorpusStats.pmiCollocations(docs, "text", minCount = 5L, topK = 5)
      .collect()
    assert(out.nonEmpty)
    assert(out.head.getAs[String]("w1") === "zx")
    assert(out.head.getAs[String]("w2") === "qy")
    assert(out.head.getAs[Long]("cnt") === 8L)
  }

  test("snapshot diffReport counts every status exactly") {
    val a = Seq((1L, "keep"), (2L, "change-me"), (3L, "drop-me")).toDF("id", "payload")
    val b = Seq((1L, "keep"), (2L, "changed!"), (4L, "new-doc")).toDF("id", "payload")
    val m = Snapshot.diffReport(a, b, "id", "payload")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("added" -> 1L, "changed" -> 1L, "removed" -> 1L, "unchanged" -> 1L))
    val st = Snapshot.diffStatus(a, b, "id", "payload")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st === Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("skew keyProfile: exact max / p99 / salt on a planted distribution") {
    // 99 keys with 1 row each + one hot key with 5000 rows
    val rows = (1 to 99).map(i => f"k$i%03d") ++ Seq.fill(5000)("hot")
    val df = rows.toDF("key")
    val out = SkewReport.keyProfile(df, "key", topN = 3, targetRowsPerKey = 1000L)
      .collect()
    assert(out.length === 3)
    val top = out.head
    assert(top.getAs[String]("key") === "hot")
    assert(top.getAs[Long]("cnt") === 5000L)
    assert(top.getAs[Long]("suggested_salt") === 5L)
    assert(top.getAs[Long]("n_keys") === 100L)
    assert(top.getAs[Long]("max_cnt") === 5000L)
    // ceil(0.99 * 100) = 99 keys have count <= 1 -> p99 is 1
    assert(top.getAs[Long]("p99_cnt") === 1L)
    // mean = 5099/100 = 50.99 -> skew = 5000/50.99
    assert(math.abs(top.getAs[Double]("skew_factor") - 5000.0 * 100.0 / 5099.0) < 1e-6)
  }

  test("skew keyProfile is invariant under input partitioning") {
    val rows = (1 to 300).map(i => s"k${i % 23}")
    val a = SkewReport.keyProfile(rows.toDF("key").repartition(1), "key", 5, 10L).collect()
    val b = SkewReport.keyProfile(rows.toDF("key").repartition(6), "key", 5, 10L).collect()
    assert(a.toSeq === b.toSeq)
  }
}
