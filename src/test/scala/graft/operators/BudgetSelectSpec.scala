package graft.operators

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BudgetSelect: the hierarchical (class → id-bucket → bounded
  * boundary bucket) refinement must equal the global
  * ORDER BY (q DESC, id) prefix-while-budget window, including under
  * heavy quality ties (the path that exercises buckets) and
  * degenerate budgets.
  */
class BudgetSelectSpec extends SparkSpec {
  import spark.implicits._

  private def replay(rows: Seq[(Long, Double, Long)], budget: Long): Seq[Long] = {
    var cum = 0L
    rows.sortBy { case (id, q, _) => (-q, id) }
      .iterator.takeWhile { case (_, _, n) => { cum += n; cum <= budget } }
      .map(_._1).toSeq.sorted
  }

  private def run(rows: Seq[(Long, Double, Long)], budget: Long,
      bucketWidth: Long = 4L): Seq[Long] = {
    val out = BudgetSelect.selectByQuality(
      rows.toDF("id", "q", "n"), "id", "q", "n", budget, bucketWidth)
    val got = out.select("id").as[Long].collect().toSeq.sorted
    graft.core.OpCache.release()
    got
  }

  test("hierarchical ≡ global-window prefix on random corpora with heavy ties") {
    val rnd = new Random(77)
    for (trial <- 1 to 4) {
      // few distinct qualities → big boundary classes → buckets exercised
      val rows = (0L until 200L).map(i =>
        (i, (rnd.nextInt(4) * 25) / 100.0, 1L + rnd.nextInt(20)))
      val total = rows.map(_._3).sum
      for (budget <- Seq(0L, 7L, total / 4, total / 2, total, total + 100)) {
        assert(run(rows, budget) === replay(rows, budget),
          s"trial $trial budget $budget diverged")
      }
    }
  }

  test("single quality class: pure id-prefix semantics (bucket machinery alone)") {
    val rows = (0L until 50L).map(i => (i, 0.5, 3L))
    // budget 40 → 13 docs (39 tokens), doc 13 would exceed
    assert(run(rows, 40L) === (0L until 13L).toSeq)
    // bucketWidth 1: one bucket per id — degenerate but exact
    assert(run(rows, 40L, bucketWidth = 1L) === (0L until 13L).toSeq)
  }

  test("sparse ids and a doc bigger than the remaining budget stop the prefix") {
    val rows = Seq((10L, 0.9, 5L), (200L, 0.9, 100L), (4000L, 0.9, 2L), (5L, 0.1, 1L))
    // order: 10 (5), 200 (+100 > 20 stops the prefix — 4000 NOT taken)
    assert(run(rows, 20L) === Seq(10L))
    assert(run(rows, 107L) === Seq(10L, 200L, 4000L))
    assert(run(rows, 108L) === Seq(5L, 10L, 200L, 4000L))
  }
}
