package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[ZOrder]]: the Morton key must be the exact bit interleave, and
  * [[ZOrder.writeClustered]] must deliver the claim it exists for —
  * per-FILE min/max bounds that tighten on BOTH dimensions, so a
  * parquet reader prunes files for a range predicate on either one.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference interleave, bit by bit: x in even positions, y odd. */
  private def refMorton(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (z, i) =>
      z | ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
    }

  test("mortonKey ≡ bit-by-bit interleave on corners and random points") {
    val rnd = new scala.util.Random(72)
    val pts = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L),
      (1L, 0L), (0L, 1L), (32768L, 1L)) ++
      Seq.fill(500)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.mortonKey(col("x"), col("y")))
      .as[(Long, Long, Long)].collect()
    for ((x, y, z) <- got) assert(z === refMorton(x, y), s"($x, $y)")
  }

  test("writeClustered: per-file bounding boxes tighten on BOTH dims (vs one-dim sort)") {
    // 128×128 uniform grid; 16 z-range files should land near-tile
    // bounding boxes (~1/4 of each dim), while a sort by x alone
    // leaves every file spanning the FULL y range
    val n = 128
    val grid = spark.range(0, n.toLong * n).select(
      (col("id") % n).as("x"), expr(s"id div $n").as("y"))
    val zdir = java.nio.file.Files.createTempDirectory("zorder_z").toString
    val xdir = java.nio.file.Files.createTempDirectory("zorder_x").toString
    ZOrder.writeClustered(grid, col("x"), col("y"), zdir,
      partitions = 16, maxRecordsPerFile = n.toLong * n)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xdir)

    // per-file spans as a fraction of the global range — what footer
    // min/max stats expose to a pruning reader
    def avgSpans(dir: String): (Double, Double) = {
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.toString)
      assert(files.length >= 8, s"expected many files in $dir, got ${files.length}")
      val spans = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(min("x"), max("x"), min("y"), max("y")).head()
        ((r.getLong(1) - r.getLong(0)).toDouble / (n - 1),
          (r.getLong(3) - r.getLong(2)).toDouble / (n - 1))
      }
      (spans.map(_._1).sum / spans.length, spans.map(_._2).sum / spans.length)
    }
    val (zx, zy) = avgSpans(zdir)
    val (sx, sy) = avgSpans(xdir)
    // z-clustered: tight on BOTH dims (ideal tiles are 1/4 × 1/4;
    // range-partitioner sampling wobbles the boundaries)
    assert(zx < 0.5, s"z-clustered avg x-span $zx not tight")
    assert(zy < 0.5, s"z-clustered avg y-span $zy not tight")
    // x-sorted: tight on x only — y stats are useless for pruning
    assert(sx < 0.5, s"x-sorted baseline avg x-span $sx not tight")
    assert(sy > 0.9, s"x-sorted baseline y-span unexpectedly tight ($sy)")
  }
}
