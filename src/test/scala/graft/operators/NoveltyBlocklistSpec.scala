package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dedup.evalNovelty (eval-set dirty/clean probe) and
  * Blocklist.matchHosts (suffix-match domain filter).
  */
class NoveltyBlocklistSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    "a b c d e f g h",         // 8 tokens
    "x y z w v u t s r q").toDF("text")

  test("evalNovelty: verbatim member is fully seen and not clean") {
    val bench = Seq((1L, "a b c d e f g h")).toDF("bench_id", "text")
    val r = Dedup.evalNovelty(corpus, "text", bench, "bench_id", "text", 4).head()
    assert(r.getAs[Long]("n_windows") === 5)
    assert(r.getAs[Long]("seen_windows") === 5)
    assert(r.getAs[Double]("novelty") === 0.0)
    assert(r.getAs[Boolean]("clean") === false)
  }

  test("evalNovelty: fully novel doc is clean") {
    val bench = Seq((1L, "p1 p2 p3 p4 p5 p6")).toDF("bench_id", "text")
    val r = Dedup.evalNovelty(corpus, "text", bench, "bench_id", "text", 4).head()
    assert(r.getAs[Long]("seen_windows") === 0)
    assert(r.getAs[Double]("novelty") === 1.0)
    assert(r.getAs[Boolean]("clean") === true)
  }

  test("evalNovelty: partial overlap counts exactly the shared windows") {
    // prefix "a b c d e" shared with corpus doc 1, suffix novel:
    // windows of 4 over 8 tokens = 5; shared = [a b c d], [b c d e]
    val bench = Seq((1L, "a b c d e n1 n2 n3")).toDF("bench_id", "text")
    val r = Dedup.evalNovelty(corpus, "text", bench, "bench_id", "text", 4).head()
    assert(r.getAs[Long]("n_windows") === 5)
    assert(r.getAs[Long]("seen_windows") === 2)
    assert(r.getAs[Double]("novelty") === 0.6)
  }

  test("evalNovelty: short doc (< window) probes as one whole-text window") {
    val bench = Seq((1L, "a b c"), (2L, "b c d")).toDF("bench_id", "text")
    val short = Seq("a b c").toDF("text")
    val rows = Dedup.evalNovelty(short, "text", bench, "bench_id", "text", 4)
      .orderBy("bench_id").collect()
    assert(rows.map(r => (r.getAs[Long]("n_windows"), r.getAs[Long]("seen_windows")))
      .toSeq === Seq((1L, 1L), (1L, 0L)))
  }

  private val rules = Seq("example.com", "tracker.net", "deep.sub.other.org")
    .toDF("rule")

  private def matchOne(host: String): (Boolean, String) = {
    val r = Blocklist.matchHosts(Seq((1L, host)).toDF("id", "host"),
      "id", "host", rules).select("blocked", "rule").head()
    (r.getBoolean(0), r.getString(1))
  }

  test("blocklist blocks the listed domain and its whole subtree") {
    assert(matchOne("example.com") === ((true, "example.com")))
    assert(matchOne("a.b.example.com") === ((true, "example.com")))
    assert(matchOne("cdn.tracker.net") === ((true, "tracker.net")))
  }

  test("blocklist does not match non-suffix or partial-label overlaps") {
    assert(matchOne("safe.org")._1 === false)
    // label boundary: notexample.com must NOT match example.com
    assert(matchOne("notexample.com")._1 === false)
    // rule deeper than host: other.org alone is not listed
    assert(matchOne("other.org")._1 === false)
  }

  test("blocklist matching is case-insensitive and trailing-dot tolerant") {
    // DNS names are case-insensitive; `host.` is the root-label FQDN form
    assert(matchOne("Ads.Tracker.NET") === ((true, "tracker.net")))
    assert(matchOne("example.com.") === ((true, "example.com")))
    // rules normalize the same way
    val ucRules = Seq("EXAMPLE.com.").toDF("rule")
    val r = Blocklist.matchHosts(
        Seq((1L, "www.Example.COM")).toDF("id", "host"), "id", "host", ucRules)
      .select("blocked", "rule").head()
    assert((r.getBoolean(0), r.getString(1)) === ((true, "example.com")))
  }

  test("stateless per-row form emits exactly the broadcast-join form's table") {
    val hosts = Seq(
      (1L, "a.b.example.com"), (2L, "Ads.Tracker.NET"), (3L, "safe.org"),
      (4L, "example.com."), (5L, "notexample.com"), (6L, "x.sub.other.org"))
      .toDF("id", "host")
    val ruleSeq = Seq("example.com", "tracker.net", "sub.other.org")
    val joined = Blocklist.matchHosts(hosts, "id", "host", ruleSeq.toDF("rule"))
      .select("id", "host", "blocked", "rule").collect().sortBy(_.getLong(0))
    val stateless = Blocklist.matchHostsStateless(hosts, "host", ruleSeq)
      .select("id", "host", "blocked", "rule").collect().sortBy(_.getLong(0))
    assert(joined.map(_.toSeq).toSeq === stateless.map(_.toSeq).toSeq)
  }

  test("blocklist longest matching suffix wins") {
    val deepRules = Seq("org", "other.org", "sub.other.org").toDF("rule")
    val r = Blocklist.matchHosts(Seq((1L, "x.sub.other.org")).toDF("id", "host"),
      "id", "host", deepRules).select("rule").head().getString(0)
    assert(r === "sub.other.org")
  }
}
