package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WriteSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned warehouse write: round-trips and prunes partitions") {
    val path = getClass.getResource("/TrainingDiary.json").getPath
    val wh = DiaryPipeline.build(spark, path)
    val out = java.nio.file.Files.createTempDirectory("graft_wh").toString
    DiaryPipeline.write(wh, out)
    val back = spark.read.parquet(out)
    assert(back.count() === wh.count())
    // partition pruning: a single-activity read must scan only that
    // partition directory
    val pruned = back.filter($"period" === "Day" && $"activity" === "Run")
    val scan = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    // both predicates must reach the scan as PARTITION filters (pruned
    // at listing time), not data filters
    assert(scan.partitionFilters.map(_.references.map(_.name).mkString).toSet
      .intersect(Set("period", "activity")).size === 2)
    assert(pruned.count() === wh.filter($"activity" === "Run").count())
  }

  test("dsum survives large magnitudes under ANSI mode (no silent null)") {
    val prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      // 10^12-scale values: DECIMAL(18,4) would overflow at the cast;
      // DECIMAL(38,6) has 10^32 headroom
      val s = Seq.fill(100)(1.23456e12).toDF("v")
        .agg(graft.core.Exact.dsum($"v")).as[Double].head()
      assert(math.abs(s - 1.23456e14) < 1.0)
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }
}
