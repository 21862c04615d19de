package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Bottom-k-by-hash: the summary must equal the global k-smallest
  * under ANY chunking and merge order (that exactness — unlike
  * Misra-Gries' order-dependent estimates — is why q110 gates the
  * raw sample table, not bound booleans).
  */
class BottomKSpec extends SparkSpec {
  import spark.implicits._

  test("property: any chunking/merge order ≡ global sorted take(k)") {
    val agg = BottomKByHash(5)
    val rnd = new Random(61)
    for (trial <- 1 to 10) {
      val items = Seq.fill(200)((rnd.nextLong(1000000L), rnd.nextLong(1000L)))
      val expect = items.distinct.sorted.take(5)
      val nChunks = 1 + (trial % 6)
      val chunks = items.grouped(math.max(1, items.size / nChunks)).toSeq
        .map(_.foldLeft(agg.zero)(agg.reduce))
      val rotated = chunks.drop(trial % chunks.size) ++ chunks.take(trial % chunks.size)
      assert(rotated.reduce(agg.merge) == expect, s"trial $trial diverged")
    }
  }

  test("udaf: distributed grouped sample matches the window replay") {
    val rnd = new Random(67)
    val rows = Seq.tabulate(500)(i =>
      (s"g${i % 3}", rnd.nextLong(100000L), i.toLong))
    val df = rows.toDF("g", "h", "id").repartition(7)
    val got = df
      .groupBy("g").agg(BottomK.bottomK(5)($"h", $"id").as("s"))
      .select(col("g"), explode(col("s")).as("pair"))
      .select(col("g"), col("pair._1").as("h"), col("pair._2").as("id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val expect = rows.groupBy(_._1).flatMap { case (g, xs) =>
      xs.map(x => (x._2, x._3)).sorted.take(5).map(p => (g, p._1, p._2))
    }.toSet
    assert(got === expect)
  }
}
