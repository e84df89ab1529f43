package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** URL canonicalization (r13, L141). Each rule pinned in isolation on
  * hand fixtures, the rules composed on a kitchen-sink URL, scheme-
  * conditional port stripping, the not-a-URL NULL, idempotence, and
  * the dedup rollup. */
class UrlCanonSpec extends SparkSpec {
  import spark.implicits._

  private def canon(u: String): Option[String] = {
    val r = Seq(u).toDF("u")
      .select(UrlCanon.canonicalize(col("u"))).collect().head
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }

  test("case: scheme and host fold, path case survives") {
    assert(canon("HTTP://Example.COM/A/B") ===
      Some("http://example.com/A/B"))
  }

  test("default port strips only for the matching scheme") {
    assert(canon("http://a.com:80/x") === Some("http://a.com/x"))
    assert(canon("https://a.com:443/x") === Some("https://a.com/x"))
    // cross-scheme and non-default ports are meaningful
    assert(canon("http://a.com:443/x") === Some("http://a.com:443/x"))
    assert(canon("https://a.com:80/x") === Some("https://a.com:80/x"))
    assert(canon("http://a.com:8080/x") === Some("http://a.com:8080/x"))
  }

  test("path: slashes collapse, trailing strips, root and empty are '/'") {
    assert(canon("http://a.com//x///y/") === Some("http://a.com/x/y"))
    assert(canon("http://a.com/") === Some("http://a.com/"))
    assert(canon("http://a.com") === Some("http://a.com/"))
  }

  test("query: tracking and empties drop, the rest sorts, bare ? drops") {
    assert(canon("http://a.com/x?b=2&utm_source=f&a=1&fbclid=z&gclid=1") ===
      Some("http://a.com/x?a=1&b=2"))
    assert(canon("http://a.com/x?utm_campaign=only") ===
      Some("http://a.com/x"))
    assert(canon("http://a.com/x?&&a=1&") === Some("http://a.com/x?a=1"))
    // a non-tracking param NAMED like a value survives; utmost= is not utm_
    assert(canon("http://a.com/x?utmost=1") ===
      Some("http://a.com/x?utmost=1"))
  }

  test("fragment drops; kitchen sink composes") {
    assert(canon("HTTPS://WWW.Ex.COM:443//a//b/?z=1&utm_x=9&y=2#sec-3") ===
      Some("https://www.ex.com/a/b?y=2&z=1"))
  }

  test("not a URL: NULL, never a garbage key") {
    assert(canon("example.com/x") === None)
    assert(canon("not a url at all") === None)
    assert(canon("://missing.scheme/x") === None)
    assert(canon("http://") === None)
  }

  test("idempotence: canon of canon is canon") {
    val urls = Seq(
      "HTTP://Example.COM:80//a//b/?z=1&utm_source=t&a=2#f",
      "https://x.org/p?b=1&a=2", "http://a.com", "junk")
    val once = urls.map(canon)
    val twice = once.map(_.flatMap(canon))
    assert(twice === once.map(_.map(identity)))
    assert(twice.flatten === once.flatten)
  }

  test("dedup rollup groups variants under one canonical key") {
    val docs = Seq(
      (1L, "HTTP://A.com/x"), (2L, "http://a.com:80//x/"),
      (3L, "http://a.com/x?utm_source=t#f"), (4L, "http://a.com/x?q=1"),
      (5L, "broken")).toDF("doc_id", "url")
    val got = UrlCanon.dedupReport(docs, "doc_id", "url")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getString(2))).toMap
    assert(got === Map(
      "http://a.com/x" -> ((3L, "6")),
      "http://a.com/x?q=1" -> ((1L, "4"))))
  }
}
