package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Columnar-format interchange: ORC beside Parquet as a first-class
  * sink/source pair. Real corpora arrive in whatever format the
  * upstream warehouse speaks — a Hive-era lake is ORC, and "switch
  * engines without rewriting 100 TB" requires reading it natively,
  * with the same scan-time machinery Parquet gets.
  *
  * Spark-first: both formats ride the identical `FileSourceScan`
  * infrastructure — vectorized column readers, predicate pushdown
  * into stripe/row-group min-max indexes (`PushedFilters` in the
  * plan), column pruning (`ReadSchema`), and Hive-style directory
  * partition pruning (`PartitionFilters`). The spec plan-locks all
  * three on the ORC path, so a format swap cannot silently drop the
  * scan-time pruning that makes a 100 TB read viable.
  *
  * 100 TB shape: `partitionBy` at write time is the lake layout
  * contract — a filter on the partition column prunes directories
  * before a single byte is read, and within each stripe the pushed
  * min-max filter skips row groups. Writer parallelism is the
  * upstream partitioning (one file per task per partition value);
  * for low-cardinality partition keys repartition by the key first
  * or the writer fans out small files ([[Layout.compact]] is the
  * repair tool).
  */
object Interchange {

  /** Write `df` as ORC (zlib, the default) under `path`, Hive-layout
    * partitioned by `partitionCols` when given.
    */
  def writeOrc(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("orc")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).save(path)
  }

  /** Read an ORC dataset (partition columns recovered from the
    * directory layout).
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
