package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(us: String*): Seq[String] =
    us.toDF("u").select(Urls.normalize(col("u"))).as[String]
      .collect().toSeq

  test("hand cases: fragment, case, tracking params, param order") {
    assert(norm("HTTPS://Example.COM/Path?b=2&utm_source=x&a=1#frag") ===
      Seq("https://example.com/Path?a=1&b=2"))
    // duplicate arrivals of the same page collapse to one key
    assert(norm(
      "HTTPS://Site.com/p?utm_source=x&id=1#top",
      "https://site.com/p?id=1",
      "https://SITE.com/p?fbclid=abc&id=1").distinct.size === 1)
    // path case is PRESERVED (RFC 3986); authority case is not
    assert(norm("http://A.B/CaseSensitive") ===
      Seq("http://a.b/CaseSensitive"))
    // emptied query drops entirely; no-query URLs pass through
    assert(norm("https://x.com/p?utm_source=only") === Seq("https://x.com/p"))
    assert(norm("https://x.com/p") === Seq("https://x.com/p"))
    // scheme-less strings: no authority match → string untouched except
    // the generic rules (stable key, degraded collapse — documented)
    assert(norm("not a url#f") === Seq("not a url"))
  }

  test("null stays null; '&&' and lone '&' artifacts cannot appear") {
    val r = Seq[Option[String]](None).toDF("u")
      .select(Urls.normalize(col("u"))).as[Option[String]].head()
    assert(r.isEmpty)
    assert(norm("https://x.com/p?&a=1&&b=2&") ===
      Seq("https://x.com/p?a=1&b=2"))
  }
}
