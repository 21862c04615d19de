package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Bloom]] wrappers: the probabilistic contract (no false negatives,
  * bounded false positives) and the exactness of the q59 composition —
  * bloom pre-filter + exact anti-join backstop ≡ plain anti-join.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("mightContain: zero false negatives; false positives stay near the design rate") {
    val seen = (0 until 500).map(i => s"seen document $i").toDF("text")
      .select(sha2($"text", 256).as("h"))
    val bloom = seen.agg(Bloom.bloomFilterAgg($"h", 500L, 4000L).as("bf")).scalar()
    val probes = (0 until 2000).map { i =>
      (i < 500, s"seen document $i") // i >= 500 never inserted
    }.toDF("inserted", "text")
      .withColumn("cand", Bloom.mightContain(bloom, sha2($"text", 256)))
    // every inserted element MUST hit (the pre-filter would otherwise
    // drop true duplicates and break exactness)
    assert(probes.filter($"inserted" && !$"cand").count() === 0L)
    // false positives: 8 bits/item ⇒ ~2% design rate; assert an order
    // of magnitude of slack, not the exact constant
    val fp = probes.filter(!$"inserted" && $"cand").count()
    assert(fp < 300, s"false-positive rate implausibly high: $fp/1500")
  }

  test("bloom pre-filter + exact anti-join ≡ plain anti-join (q59 composition)") {
    val seen = (0 until 300).map(i => (i.toLong, s"content $i")).toDF("doc_id", "text")
      .select(sha2($"text", 256).as("_h"))
    // fresh: 200 true dups of seen + 300 genuinely new
    val fresh = ((100 until 300).map(i => (i.toLong + 10000, s"content $i")) ++
      (0 until 300).map(i => (i.toLong + 20000, s"novel $i")))
      .toDF("doc_id", "text")
      .withColumn("_h", sha2($"text", 256))
    val plain = fresh.join(seen, Seq("_h"), "left_anti")
      .select("doc_id").as[Long].collect().sorted
    val bloom = seen.agg(Bloom.bloomFilterAgg($"_h", 1000L, 8000L).as("bf")).scalar()
    val flagged = fresh.withColumn("_cand", Bloom.mightContain(bloom, $"_h"))
    val pre = flagged.filter(!$"_cand").select("doc_id")
      .unionByName(flagged.filter($"_cand").join(seen, Seq("_h"), "left_anti").select("doc_id"))
      .as[Long].collect().sorted
    assert(pre.toSeq === plain.toSeq)
    assert(pre.length === 300)
  }
}
