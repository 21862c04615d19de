package graft

import org.apache.spark.sql.functions._

/** Smoke of the driver contract: entry returns rows on sf0.001 and the
  * 'All' cell equals the sum over concrete cells per day.
  */
class SparkEntrySpec extends SparkSpec {
  import spark.implicits._

  test("query registry ≡ oracle registry (no rows-only gaps, no orphan oracles)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q === o, s"queries without oracle: ${(q -- o).toSeq.sorted}; " +
      s"oracles without query: ${(o -- q).toSeq.sorted}")
    assert(q.forall(_.matches("q\\d{2,3}_[a-z0-9_]+")), "non-conforming query name")
  }

  test("entry: >0 rows, All cell present, first-row null discipline") {
    val df = SparkEntry.entry(spark).cache()
    assert(df.count() > 0)
    val types = df.select("event_type").distinct().as[String].collect().toSet
    assert(types.contains("All") && types.size > 1)
    val firstRows = df.filter($"d" === df.agg(min("d")).head().getDate(0))
    assert(firstRows.select("monotony").as[Double].collect().forall(_ === 0.0))
    // All-cell tss = sum of concrete cells per day
    val d0 = df.agg(max("d")).head().getDate(0)
    val all = df.filter($"d" === d0 && $"event_type" === "All").select("tss").as[Double].head()
    val sum = df.filter($"d" === d0 && $"event_type" =!= "All").agg(org.apache.spark.sql.functions.sum("tss")).as[Double].head()
    assert(math.abs(all - sum) < 1e-6)
  }
}
