package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet corpus (TESTDATA.md).
  *
  * Each table is one parquet file under the scale-factor dir. Reads go
  * through `spark.read.parquet` so Catalyst gets predicate pushdown and
  * column pruning for free; at cluster scale these would be partitioned
  * directories and the same code holds.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = apply(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "lineitem")
  /** `events.ts` arrives in whatever physical encoding the corpus
    * generator used, which has varied across regenerations:
    *
    *  - TIMESTAMP(NANOS), which Spark does not model
    *    (PARQUET_TYPE_ILLEGAL). Sessions set
    *    `spark.sql.legacy.parquet.nanosAsLong=true` so it arrives as
    *    epoch-nanos LongType; normalized via integer division (`div` —
    *    a double roundtrip would lose precision above 2^53).
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4 infers
    *    as TIMESTAMP_NTZ. Under the pinned UTC session timezone a
    *    plain cast to TimestampType is value-identical (both are the
    *    same micros-since-epoch payload), and it keeps every
    *    downstream function (`unix_micros`, `window`, watermarks) on
    *    the instant type they expect.
    *  - plain TIMESTAMP (isAdjustedToUTC=true) passes through.
    *
    * Normalizing here — at the single choke-point every query reads
    * through — means the 70+ gated queries never see the encoding.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // settable at runtime — the driver's own session may not carry it
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the NTZ→instant cast below is value-identical ONLY under a UTC
    // session timezone. ASSERT rather than set: silently mutating the
    // caller's session timezone would shift every unrelated
    // timestamp render in their session — the same class of silent
    // instant-shifting this guard exists to prevent. (The cast is
    // LAZY, so a set-and-restore around this method wouldn't protect
    // it either; failing loudly here is the only sound option.)
    require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
      "Tables.events requires spark.sql.session.timeZone=UTC: the " +
        "TIMESTAMP_NTZ→TIMESTAMP normalization is value-identical only " +
        "under UTC. Pin it in the SparkSession builder (all graft " +
        "entrypoints do).")
    val df = apply(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
