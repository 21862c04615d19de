package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** [[Layout]] plan locks — these asserts ARE the operator's value: a
  * bucketed join that silently re-shuffles, or a "pruned" join that
  * scans every partition, is indistinguishable from the naive plan on
  * correctness and only reveals itself at the 100 TB bill.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  /** Post-execution physical plan with the AQE wrapper peeled off —
    * `AdaptiveSparkPlanExec` keeps its current plan out of `children`,
    * so a bare `collect` over the wrapper sees an empty tree.
    */
  private def finalPlan(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }

  /** Every node of the post-execution plan, descending through the
    * AQE wrapper AND materialized query stages (both keep their inner
    * plan out of `children`, so a bare `collect` stops at them).
    */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] =
    p.collect { case n => n }.flatMap {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allNodes(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        s +: allNodes(s.plan)
      case n => Seq(n)
    }

  test("coLocatedJoin of identically-bucketed tables has ZERO shuffle exchanges") {
    val d = tmp("bucketed")
    val left = (1 to 2000).map(i => (i.toLong % 100, i.toDouble)).toDF("k", "v")
    val right = (0L until 100L).map(i => (i, s"n$i")).toDF("k", "name")
    Layout.writeBucketed(left, "lay_l", s"$d/l", "k", 4)
    Layout.writeBucketed(right, "lay_r", s"$d/r", "k", 4)
    val j = Layout.coLocatedJoin(spark, "lay_l", "lay_r", "k")
    assert(j.count() === 2000)
    val plan = finalPlan(j)
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty,
      s"bucketed join still shuffles:\n$plan")
    assert(plan.toString.contains("SortMergeJoin"),
      s"expected a sort-merge join over the bucketed scans:\n$plan")
    // bucketed scans announce the layout — the scan itself carries the
    // bucket spec (output partitioning satisfies the join's
    // distribution requirement; that is WHY no exchange is planned)
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.length === 2 && scans.forall(_.bucketedScan),
      s"join children are not bucketed scans:\n$plan")
  }

  test("prunedFactJoin: dynamic partition pruning skips unselected partitions") {
    val d = tmp("dpp")
    val fact = (1 to 3000).map { i =>
      (i.toLong, i % 30 + 1, i.toDouble)
    }.toDF("id", "day", "v")
    Layout.writePartitioned(fact, "day", s"$d/fact")
    (1 to 30).map(day => (day, (day - 1) / 7 + 1)).toDF("day", "wk")
      .write.mode("overwrite").parquet(s"$d/dim")
    val f = spark.read.parquet(s"$d/fact")
    val dim = spark.read.parquet(s"$d/dim").filter($"wk" === 2)
    val q = Layout.prunedFactJoin(f, dim, "day").agg(count(lit(1)), sum("v"))
    q.collect()
    val scans = allNodes(finalPlan(q)).collect {
      case s: FileSourceScanExec if s.relation.location.rootPaths.exists(_.toString.contains("fact")) => s
    }
    assert(scans.nonEmpty, "no fact scan found")
    val scan = scans.head
    // the pruning filter must be DYNAMIC (planted from the dim side at
    // runtime, not a static literal the optimizer could see)
    assert(scan.partitionFilters.map(_.toString).exists(_.contains("dynamicpruning")),
      s"fact scan has no dynamic pruning filter: ${scan.partitionFilters}")
    // and it must actually skip partitions: 7 of 30 days are week 2
    val read = scan.metrics.get("numPartitions").map(_.value)
    assert(read.contains(7L),
      s"expected 7 of 30 partitions read, got $read")
  }

  test("compact: bin-packs slivers, preserves content, clusters per-file ranges") {
    val in = tmp("compact_in")
    val out = tmp("compact_out")
    val df = spark.range(0, 50000).select(
      col("id"), (col("id") % 997).as("v"),
      md5(col("id").cast("string")).as("pad"))
    df.repartition(32).write.mode("overwrite").parquet(in)

    val stats = graft.operators.Layout.compact(spark, in, out,
      targetBytes = 64L << 20, clusterBy = Seq("id"))
    assert(stats.filesBefore === 32)
    assert(stats.filesAfter < stats.filesBefore, stats.toString)

    // pure layout: content identical through the rewrite
    val a = df.orderBy("id").collect().toSeq
    val b = spark.read.parquet(out).orderBy("id").collect().toSeq
    assert(a === b)

    // clusterBy(id) → per-file id ranges are disjoint (footer min/max
    // tighten, so an id predicate can skip whole files)
    val perFile = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("id").as("lo"), max("id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    perFile.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"overlapping file ranges: ${perFile.toSeq}")
      case _ =>
    }
  }
}
