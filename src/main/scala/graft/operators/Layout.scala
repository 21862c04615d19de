package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators: the two storage-side levers that remove
  * whole exchanges from a 100 TB warehouse — bucketing (co-located
  * joins: both fact tables pre-shuffled ON DISK by the join key, so
  * the join runs with ZERO runtime exchange on either side) and
  * partitioned layout (dynamic partition pruning: a selective dim
  * filter prunes fact partitions AT RUNTIME, so the scan never reads
  * the excluded data at all).
  *
  * Both are declarative: the write records the layout in the catalog /
  * directory structure and Catalyst's existing rules (bucket-join
  * planning, `PlanDynamicPruningFilters`) exploit it — no custom
  * strategy needed, which is exactly the Spark-first answer to the
  * reference's clustered-table DDL surface (schema.sql's per-table
  * PRIMARY KEY layout; populate_from_json.py's day-keyed upsert scan).
  *
  * Scale notes:
  *  - Bucket count is a LAYOUT constant (it fixes the join's
  *    parallelism floor); pick buckets ≈ table_size / target_task_mb
  *    at write time. Re-bucketing is a full rewrite — the API takes it
  *    explicitly, no default.
  *  - Bucketed writes emit one file per (task, bucket); write with
  *    `repartition(bucketCol)` first so each bucket is ONE file and
  *    the per-bucket sort survives for sort-merge reuse (Spark skips
  *    the join-side sort only when every bucket has a single sorted
  *    file).
  *  - DPP fires when the join side is broadcastable OR the pruning
  *    subquery is cheaper than the skipped scan; the partition column
  *    must be the raw join key (no expression wrapping), which
  *    [[prunedFactJoin]] preserves.
  */
object Layout {

  /** Write `df` as a bucketed, per-bucket-sorted parquet TABLE
    * (bucketing lives in the session catalog — path-only parquet has
    * nowhere to record it; this is Spark's own datasource-table
    * bucketing, no Hive metastore involved). `repartition` by the
    * bucket key first so every bucket is exactly one sorted file —
    * the layout that lets the downstream sort-merge join skip BOTH
    * the exchange and the sort.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      bucketCol: String,
      buckets: Int): Unit =
    df.repartition(buckets, col(bucketCol))
      .write.mode("overwrite")
      .format("parquet").option("path", path)
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)

  /** Inner-join two identically-bucketed tables on their shared bucket
    * key. With both sides bucketed into the same count on the join
    * key, Catalyst plans a sort-merge join whose children are bare
    * file scans — no ShuffleExchange on either side (the 100 TB win:
    * the two biggest tables in the warehouse join without moving a
    * byte between executors). Broadcast is disabled for the join so
    * the co-located plan is the one that runs — at real scale neither
    * side fits a broadcast anyway, and silently broadcasting would
    * un-demonstrate the layout this operator exists for.
    */
  def coLocatedJoin(
      spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.hint("merge").join(r.hint("merge"), Seq(key))
  }

  /** Write `df` hive-partitioned by `partCol` (one directory per
    * value) — the layout that turns a partition-key predicate into
    * file-listing pruning, and a partition-key JOIN into dynamic
    * partition pruning.
    */
  def writePartitioned(df: DataFrame, partCol: String, path: String): Unit =
    df.write.mode("overwrite").partitionBy(partCol).parquet(path)

  /** Join a partitioned fact table to a filtered dim on the fact's
    * partition column. The filter lives on the DIM side only — at
    * plan time Spark cannot prune fact partitions statically, so
    * `PartitionPruning` inserts a dynamic pruning subquery: the dim's
    * broadcast exchange is REUSED as an IN-filter on the fact scan's
    * partition listing, and the pruned partitions are never read
    * (PlanShapeSpec locks the `dynamicpruning` filter and the
    * partition-count drop). The fact side passes through unwrapped —
    * DPP requires the raw partition column as the join key.
    */
  def prunedFactJoin(
      fact: DataFrame, dim: DataFrame, partCol: String): DataFrame =
    fact.join(dim, Seq(partCol))

  case class CompactStats(filesBefore: Int, filesAfter: Int, bytesBefore: Long)

  /** Small-file compaction: rewrite a directory of parquet slivers as
    * ⌈total_bytes / targetBytes⌉ right-sized files. The third
    * storage-side lever after bucketing and partitioning — streaming
    * sinks, MERGE batches and over-parallel writes leave thousands of
    * KB-scale files per directory, and at 100 TB the per-file overhead
    * (footer parse, open/seek, scheduler task per tiny split, NameNode
    * pressure) comes to dominate scan cost. Compaction is pure layout:
    * content is untouched (the q81 gate hashes every row through the
    * rewrite), only the file boundaries move.
    *
    * `clusterBy` optionally range-partitions the rewrite on the given
    * columns, so compaction doubles as a clustering pass: per-file
    * min/max footers tighten on those columns and later predicate scans
    * skip whole files (the q71/q72 layout argument — compact-then-
    * cluster is how a MERGE-heavy table recovers skippability).
    *
    * The plan is one scan → one exchange (round-robin or range) → one
    * write: no collect, no driver bottleneck; the file listing used for
    * sizing reads directory metadata only.
    */
  def compact(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      targetBytes: Long,
      clusterBy: Seq[String] = Nil): CompactStats = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val files = listParquet(spark, inPath)
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(inPath)
    val repacked =
      if (clusterBy.nonEmpty) df.repartitionByRange(nOut, clusterBy.map(col): _*)
      else df.repartition(nOut)
    repacked.write.mode("overwrite").parquet(outPath)
    CompactStats(files.length, listParquet(spark, outPath).length, totalBytes)
  }

  private def listParquet(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    val out = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.hadoop.fs.LocatedFileStatus]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) out += f
    }
    out.toSeq
  }
}
