package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class PslSpec extends SparkSpec {
  import spark.implicits._

  private def dom(host: String): Option[String] =
    Option(PslKernel.registrable(UTF8String.fromString(host), Psl.snapshot))
      .map(_.toString)

  test("kernel: every publicsuffix.org rule class") {
    // flat gTLD + multi-label registries
    assert(dom("example.com") === Some("example.com"))
    assert(dom("www.example.com") === Some("example.com"))
    assert(dom("news.bbc.co.uk") === Some("bbc.co.uk"))
    assert(dom("bbc.co.uk") === Some("bbc.co.uk"))
    assert(dom("deep.sub.x.com.au") === Some("x.com.au"))
    // private-section suffix: sites stay distinct
    assert(dom("alice.github.io") === Some("alice.github.io"))
    assert(dom("www.alice.github.io") === Some("alice.github.io"))
    // a bare public suffix has NO registrable domain
    assert(dom("github.io") === None)
    assert(dom("co.uk") === None)
    assert(dom("com") === None)
    // wildcard *.ck: every second-level name is a registry
    assert(dom("shop.bar.ck") === Some("shop.bar.ck"))
    assert(dom("bar.ck") === None)
    // exception !www.ck carves out a registrable domain
    assert(dom("www.ck") === Some("www.ck"))
    assert(dom("foo.www.ck") === Some("www.ck"))
    // *.kawasaki.jp with !city.kawasaki.jp
    assert(dom("city.kawasaki.jp") === Some("city.kawasaki.jp"))
    assert(dom("sub.city.kawasaki.jp") === Some("city.kawasaki.jp"))
    assert(dom("w.kawasaki.jp") === None)
    assert(dom("blog.w.kawasaki.jp") === Some("blog.w.kawasaki.jp"))
    assert(dom("kawasaki.jp") === Some("kawasaki.jp")) // plain 'jp' rule
    // implicit default rule "*": unknown TLD behaves as one-label suffix
    assert(dom("site.zz") === Some("site.zz"))
    assert(dom("a.site.zz") === Some("site.zz"))
    assert(dom("zz") === None)
  }

  test("kernel: case, FQDN dot, malformed hosts") {
    assert(dom("News.BBC.CO.UK") === Some("bbc.co.uk"))
    assert(dom("example.com.") === Some("example.com"))
    assert(dom("") === None)
    assert(dom("a..b.com") === None)
    assert(dom(".com") === None)
  }

  test("column path (codegen) and SQL registration agree with the kernel") {
    val hosts = Seq("news.bbc.co.uk", "alice.github.io", "github.io",
      "foo.www.ck", "x.site.zz", "Example.COM.")
    val viaColumn = hosts.toDF("h")
      .select(Psl.registrableDomain(col("h")).as("d"))
      .as[Option[String]].collect().toSeq
    GraftFunctions.register(spark)
    val viaSql = hosts.toDF("h").createOrReplaceTempView("psl_hosts")
    val sqlOut = spark.sql("SELECT graft_psl_domain(h) AS d FROM psl_hosts")
      .as[Option[String]].collect().toSeq
    val direct = hosts.map(dom)
    assert(viaColumn === direct)
    assert(sqlOut === direct)
  }

  test("registrableDomainPsl extracts the host from a full URL") {
    val out = Seq("HTTPS://News.BBC.co.uk/story?id=1#frag",
      "http://alice.github.io/p/2")
      .toDF("url")
      .select(Url.registrableDomainPsl(col("url")).as("d"))
      .as[String].collect().toSeq
    assert(out === Seq("bbc.co.uk", "alice.github.io"))
  }
}
