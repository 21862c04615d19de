package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Redact (PII), HtmlClean (markup), CorpusShuffle (seeded shards). */
class ScrubSpec extends SparkSpec {
  import spark.implicits._

  // ---- Redact ----

  private def redactOne(text: String): (Int, Int, Int, String) = {
    val r = Redact.redactPii(Seq(text).toDF("text"), "text")
      .select("n_emails", "n_phones", "n_ips", "clean_text")
      .head()
    (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3))
  }

  test("redactPii replaces each PII kind with its sentinel") {
    val (e, p, i, t) = redactOne(
      "write a@b.org or call +1-555-123-4567 from 10.0.0.1 ok")
    assert((e, p, i) === ((1, 1, 1)))
    assert(t === "write <EMAIL> or call <PHONE> from <IP> ok")
  }

  test("redactPii counts are per-pass and disjoint") {
    // the email's domain embeds an IP literal: the email pass consumes
    // it, so n_ips must NOT count it
    val (e, _, i, t) = redactOne("user@10.0.0.1.example.com and 1.2.3.4")
    assert(e === 1 && i === 1)
    assert(t === "<EMAIL> and <IP>")
  }

  test("redactPii leaves clean text untouched") {
    val (e, p, i, t) = redactOne("no pii here, just words and 12 numbers")
    assert((e, p, i) === ((0, 0, 0)))
    assert(t === "no pii here, just words and 12 numbers")
  }

  test("redactPii ip word boundary: digit runs in longer tokens don't match") {
    val (_, _, i, t) = redactOne("version 1.2.3.4567 stays, 9.8.7.6 goes")
    assert(i === 1)
    assert(t === "version 1.2.3.4567 stays, <IP> goes")
  }

  test("redactPii matches the parenthesized, dashed and dotted phone layouts") {
    val (_, p, _, t) =
      redactOne("ring (555) 123-4567 or 555.123.4567 or 555-123-4567")
    assert(p === 3)
    assert(t === "ring <PHONE> or <PHONE> or <PHONE>")
  }

  test("redactPii deliberately leaves bare 10-digit runs (ids, not phones)") {
    val (_, p, _, t) = redactOne("id 5551234567 is not a phone")
    assert(p === 0)
    assert(t === "id 5551234567 is not a phone")
  }

  test("redactPii rejects invalid IPv4 octets and leading-zero forms") {
    val (_, _, i, t) = redactOne(
      "999.999.999.999 and 256.1.1.1 and 01.2.3.4 stay; 255.255.255.255 goes")
    assert(i === 1)
    assert(t === "999.999.999.999 and 256.1.1.1 and 01.2.3.4 stay; <IP> goes")
  }

  test("redactPii multi-occurrence counting") {
    val (e, _, _, t) = redactOne("a@x.io b@y.co c@z.net")
    assert(e === 3)
    assert(t === "<EMAIL> <EMAIL> <EMAIL>")
  }

  // ---- Redact.redactCreditCards (Luhn gate) ----

  private def ccOne(text: String): (Int, Int, String) = {
    val r = Redact.redactCreditCards(Seq(text).toDF("text"), "text")
      .select("n_cc", "n_rejected", "clean_text").head()
    (r.getInt(0), r.getInt(1), r.getString(2))
  }

  test("luhn-valid PAN is redacted, near-miss survives and is counted") {
    val (cc, rej, t) = ccOne("pay 4539148803436467 not 4539148803436468 ok")
    assert((cc, rej) === ((1, 1)))
    assert(t === "pay <CC> not 4539148803436468 ok")
  }

  test("dashed and spaced 4-4-4-4 groups pass the gate") {
    val (cc, _, t) = ccOne("a 4539-1488-0343-6467 b 6011 0009 9013 9424 c")
    assert(cc === 2)
    assert(t === "a <CC> b <CC> c")
  }

  test("luhn-valid numbers below the 13-digit floor survive") {
    val (cc, rej, t) = ccOne("order 79927398713 shipped")
    assert((cc, rej) === ((0, 0)))
    assert(t === "order 79927398713 shipped")
  }

  test("17+ digit runs are not candidates (word-bounded length cap)") {
    val (cc, rej, t) = ccOne("ean 45391488034364679 raw")
    assert((cc, rej) === ((0, 0)))
    assert(t === "ean 45391488034364679 raw")
  }

  test("15-digit amex-length contiguous PAN passes") {
    val (cc, _, t) = ccOne("amex 371449635398431 end")
    assert(cc === 1)
    assert(t === "amex <CC> end")
  }

  // ---- HtmlClean ----

  private def cleanOne(text: String): (Int, String) = {
    val r = HtmlClean.stripMarkup(Seq(text).toDF("text"), "text")
      .select("n_tags", "clean_text").head()
    (r.getInt(0), r.getString(1))
  }

  test("stripMarkup removes tags as single spaces and counts them") {
    val (n, t) = cleanOne("<p>alpha</p><br>beta")
    assert(n === 3)
    assert(t === "alpha beta")
  }

  test("stripMarkup decodes entities with &amp; last") {
    // double-escaped &amp;lt; must surface as &lt;, NOT <
    val (_, t) = cleanOne("&amp;lt;kept&amp;gt; &lt;gone&gt; &quot;q&quot; &#39;s&#39; a&nbsp;b")
    assert(t === "&lt;kept&gt; <gone> \"q\" 's' a b")
  }

  test("stripMarkup collapses whitespace and trims") {
    val (_, t) = cleanOne("  a \t\t b \n\n c  ")
    assert(t === "a b c")
  }

  test("stripMarkup is identity on markup-free text") {
    val (n, t) = cleanOne("plain text with x < y inequality spared")
    // a bare '<' with no closing '>' after non-empty span: "< y inequality spared"
    // has no '>' at all, so no tag matches
    assert(n === 0)
    assert(t === "plain text with x < y inequality spared")
  }

  // ---- CorpusShuffle ----

  test("shardManifest partitions every doc exactly once, balanced") {
    val n = 5000
    val df = spark.range(n).select(col("id").as("doc_id"))
    val m = CorpusShuffle.shardManifest(df, "doc_id", "s1", 16).collect()
    assert(m.map(_.getLong(0)).toSeq === (0L until 16L))
    val counts = m.map(_.getLong(1))
    assert(counts.sum === n)
    // uniform keys: no shard deviates from n/16 by more than 5σ
    val exp = n / 16.0
    val sigma = math.sqrt(exp * (1 - 1.0 / 16))
    counts.foreach(c => assert(math.abs(c - exp) < 5 * sigma,
      s"shard count $c vs expected $exp"))
  }

  test("assignShards is a pure function of (seed, id): reruns agree, seeds differ") {
    val df = spark.range(500).select(col("id").as("doc_id"))
    val a1 = CorpusShuffle.assignShards(df, "doc_id", "seedA", 8)
      .select("doc_id", "shard", "shuffle_key").collect().sortBy(_.getLong(0))
    val a2 = CorpusShuffle.assignShards(df.repartition(7), "doc_id", "seedA", 8)
      .select("doc_id", "shard", "shuffle_key").collect().sortBy(_.getLong(0))
    assert(a1.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      a2.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
    val b = CorpusShuffle.assignShards(df, "doc_id", "seedB", 8)
      .select("shard").collect().map(_.getLong(0))
    assert(a1.map(_.getLong(1)).toSeq !== b.toSeq)
  }

  test("shardManifest fingerprint is sensitive to membership") {
    val df = spark.range(200).select(col("id").as("doc_id"))
    val full = CorpusShuffle.shardManifest(df, "doc_id", "s", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    val dropped = CorpusShuffle.shardManifest(
        df.filter(col("doc_id") =!= 7), "doc_id", "s", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    // doc 7 lands in exactly one shard; that shard's fp must change
    assert(full.count { case (s, fp) => dropped.get(s).exists(_ != fp) } === 1)
  }
}
