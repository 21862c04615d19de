package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Demonstrates the co-located-join layout for repeated large-fact
  * joins (SURVEY §1.4 / builder brief: "repartition()/bucketing for
  * co-located joins"): two tables bucketed on the join key by the same
  * bucket count join WITHOUT any Exchange — at 100 TB that's the
  * difference between a full network shuffle of both fact tables per
  * query and none.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("equal-bucketed tables join with zero shuffles") {
    // warehouse dir is a temp dir (static conf, set in SparkSpec)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")
    (1L to 1000L).map(i => (i, s"o$i")).toDF("key", "o")
      .write.bucketBy(8, "key").sortBy("key").saveAsTable("b_orders")
    (1L to 3000L).map(i => (i % 1000 + 1, s"i$i")).toDF("key", "it")
      .write.bucketBy(8, "key").sortBy("key").saveAsTable("b_items")

    // force a sort-merge join (tiny test tables would auto-broadcast,
    // which bypasses bucketing entirely)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders").join(spark.table("b_items"), "key")
      val shuffles = joined.queryExecution.executedPlan.toString()
        .linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(shuffles === 0, "bucketed join must not shuffle either side")
      assert(joined.count() === 3000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    // the same join without bucketing shuffles (or broadcasts) — the
    // point of the layout
    val plain = (1L to 1000L).map(i => (i, s"o$i")).toDF("key", "o")
      .join((1L to 3000L).map(i => (i % 1000 + 1, s"i$i")).toDF("key", "it"), "key")
    assert(plain.count() === 3000)
  }
}
