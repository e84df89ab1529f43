package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextAnalysis

class TextScrubSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(s: String): String =
    Seq(s).toDF("t").select(TextAnalysis.scrubPii(col("t")))
      .as[String].head()

  test("scrubPii redacts emails and URLs, leaving surrounding text") {
    assert(scrub("mail a.b+c@ex-ample.org now") === "mail <EMAIL> now")
    assert(scrub("see https://ex.com/p?q=1#f end") === "see <URL> end")
    assert(scrub("plain text untouched") === "plain text untouched")
    assert(scrub("x http://a.io y b@c.de z") === "x <URL> y <EMAIL> z")
  }

  test("scrubPii scrubs URLs first: userinfo emails belong to the URL") {
    // email-shaped userinfo inside a URL must not be split by the email
    // pass — the whole URL goes
    assert(scrub("go https://user@host.com/path now") === "go <URL> now")
  }

  test("matchCount counts non-overlapping matches") {
    val df = Seq("a@b.co and c@d.ef plus https://x.yz").toDF("t")
    val (e, u) = df.select(
        TextAnalysis.matchCount(col("t"), TextAnalysis.EmailPattern),
        TextAnalysis.matchCount(col("t"), TextAnalysis.UrlPattern))
      .as[(Int, Int)].head()
    assert(e === 2 && u === 1)
  }

  test("email audit over URL-masked text equals the scrub's redaction count") {
    // raw-text email count over-reports on userinfo URLs; the masked form
    // counts exactly what scrubPii redacts as <EMAIL>
    val df = Seq("a@b.co visits https://user@host.com/x").toDF("t")
    val (raw, masked) = df.select(
        TextAnalysis.matchCount(col("t"), TextAnalysis.EmailPattern),
        TextAnalysis.matchCount(
          regexp_replace(col("t"), TextAnalysis.UrlPattern, "<URL>"),
          TextAnalysis.EmailPattern))
      .as[(Int, Int)].head()
    assert(raw === 2 && masked === 1)
  }

  test("patterns avoid engine-specific regex syntax (portability contract)") {
    // no backreferences, lookarounds, or possessive quantifiers — the
    // constructs RE2-family engines (the DuckDB oracle among them) reject
    val banned = Seq("\\1", "(?=", "(?!", "(?<", "*+", "++")
    Seq(TextAnalysis.EmailPattern, TextAnalysis.UrlPattern).foreach { p =>
      banned.foreach(b => assert(!p.contains(b), s"$p contains $b"))
    }
  }
}
