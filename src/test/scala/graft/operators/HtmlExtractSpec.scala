package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** HTML-to-text extraction + boilerplate removal (L123). Hand-built
  * pages pin each rule of the chain — chrome strip, block segmentation,
  * every rung of the classification ladder (short / link-dense /
  * low-stopword / length-override / content), document-order
  * reassembly — plus a plain-Scala replay of the whole battery on the
  * synthetic fixture pages. */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def run(pages: (Long, String)*) =
    HtmlExtract.extract(pages.toSeq.toDF("id", "html"), "id", "html")
      .orderBy("id")

  test("script/style/head chrome never reaches the text") {
    val out = run((1L,
      "<html><head><title>SECRET TITLE</title><style>p{x:1}</style>" +
        "</head><body><script type=\"a\">var EVIL = 1;</script>" +
        "<p>the article body is a long piece of prose and it keeps " +
        "going with many stopword carrying words in it</p>" +
        "</body></html>")).head()
    assert(out.getAs[Long]("n_content") === 1L)
    val text = out.getAs[String]("text")
    assert(text.contains("the article body"))
    assert(!text.contains("SECRET") && !text.contains("EVIL") &&
      !text.contains("x:1"))
  }

  test("a link-dense nav block is boilerplate even when long") {
    val nav = (1 to 10).map(i => s"""<a href="/$i">Section$i</a>""")
      .mkString(" ")
    val out = run((1L, s"<body><nav>$nav</nav>" +
      "<p>the real content of the page is here and it talks at length " +
      "about a topic in plain prose</p></body>")).head()
    assert(out.getAs[Long]("n_link") === 1L)
    assert(out.getAs[Long]("n_content") === 1L)
    assert(!out.getAs[String]("text").contains("Section"))
  }

  test("the classification ladder: short beats link beats low_stop") {
    val out = run((1L,
      "<p>tiny</p>" + // < 25 chars -> short (even though 0 links)
      "<div><a href=\"/x\">Subscribe to our newsletter now</a></div>" + // link
      "<p>copyright example corp all rights reserved worldwide</p>" + // no stopwords -> low_stop
      "<p>the quick brown fox jumps over a lazy dog near the river</p>" // content
    )).head()
    assert(out.getAs[Long]("n_short") === 2L) // 'tiny' + the empty tail
    assert(out.getAs[Long]("n_link") === 1L)
    assert(out.getAs[Long]("n_low_stop") === 1L)
    assert(out.getAs[Long]("n_content") === 1L)
    assert(out.getAs[String]("text").startsWith("the quick brown"))
  }

  test("length override: a long low-stopword block is still content") {
    val longBlock = Seq.fill(45)("word").mkString(" ") // 224 chars, 0 stop
    assert(longBlock.length >= 200)
    val out = run((1L, s"<p>$longBlock</p>")).head()
    assert(out.getAs[Long]("n_content") === 1L)
    assert(out.getAs[Long]("n_low_stop") === 0L)
  }

  test("content blocks reassemble in document order, '\\n'-joined") {
    val out = run((1L,
      "<p>the first paragraph is about a dog and it has stopwords</p>" +
      "<nav><a href=\"/\">Home</a></nav>" +
      "<p>the second paragraph is about a cat and it has stopwords</p>"
    )).head()
    val lines = out.getAs[String]("text").split("\n").toSeq
    assert(lines.size === 2)
    assert(lines.head.contains("first") && lines(1).contains("second"))
  }

  test("a page with no content blocks reports the empty-string md5") {
    val out = run((1L, "<nav><a href=\"/a\">A</a> <a href=\"/b\">B</a>" +
      "</nav><p>short</p>")).head()
    assert(out.getAs[Long]("n_content") === 0L)
    assert(out.getAs[String]("text") === "")
    // md5('') — the fixed sentinel both engines agree on
    assert(out.getAs[String]("extract_md5") ===
      "d41d8cd98f00b204e9800998ecf8427e")
  }

  test("null ids and null pages are dropped, not crashed on") {
    val df = Seq((Option(1L), Option("<p>the text of a page that is " +
        "long enough to classify</p>")),
      (Option.empty[Long], Option("<p>x</p>")),
      (Option(2L), Option.empty[String]))
      .toDF("id", "html")
    assert(HtmlExtract.extract(df, "id", "html").count() === 1L)
  }

  test("matches a plain-Scala replay of the battery on fixture pages") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over a lazy dog and then naps in " +
        "warm sun while the day goes by and nothing else happens at all"),
      (1L, "alpha beta gamma delta"),
      (2L, "a b"),
      (3L, "")
    ).toDF("doc_id", "text")
    val got = HtmlExtract.extract(
        HtmlExtract.synthesize(docs, "doc_id", "text"), "doc_id", "html")
      .orderBy("doc_id")
      .select("doc_id", "n_blocks", "n_short", "n_link", "n_low_stop",
        "n_content", "text")
      .collect().toSeq

    val stop = HtmlExtract.Stopwords.toSet
    def replay(id: Long, text: String): Row = {
      val words = text.split(" ", -1).toSeq
      val paras = words.grouped(12).map(_.mkString(" ")).toSeq
      val html = s"""<html><head><title>Doc $id</title><style>body{margin:0}</style><script>var t=1;</script></head><body>""" +
        """<nav><a href="/">Home</a> <a href="/news">News</a> <a href="/about">About</a> <a href="/contact">Contact</a> <a href="/archive">Archive</a> <a href="/subscribe">Subscribe</a></nav>""" +
        """<div><a href="/subscribe">Subscribe</a> <a href="/signin">Sign in</a></div>""" +
        paras.map(p => s"<p>$p</p>").mkString +
        """<div>Share: <a href="/t">Tweet</a> <a href="/f">Share</a> <a href="/l">Like</a> <a href="/fo">Follow</a> <a href="/p">Pin</a></div>""" +
        """<footer>Copyright 2026 Example Corp <a href="/terms">Terms</a> <a href="/privacy">Privacy</a></footer></body></html>"""
      val cleaned = html
        .replaceAll("<head>.*?</head>", " ")
        .replaceAll("<script[^>]*>.*?</script>", " ")
        .replaceAll("<style[^>]*>.*?</style>", " ")
      val blocks = cleaned.split("</(?:p|div|li|nav|footer|h1|h2|h3)>", -1)
      val classed = blocks.toSeq.map { b =>
        val btxt = b.replaceAll("<[^>]*>", " ").replaceAll(" +", " ").trim
        val link = "<a [^>]*>([^<]*)</a>".r.findAllMatchIn(b)
          .map(_.group(1).length).sum
        val ws = btxt.split(" ", -1).toSeq
        val nStop = ws.count(stop)
        val cls =
          if (btxt.length < 25) "short"
          else if (2 * link >= btxt.length) "link"
          else if (20 * nStop < ws.size && btxt.length < 200) "low_stop"
          else "content"
        (cls, btxt)
      }
      def n(c: String) = classed.count(_._1 == c).toLong
      Row(id, classed.size.toLong, n("short"), n("link"), n("low_stop"),
        n("content"),
        classed.filter(_._1 == "content").map(_._2).mkString("\n"))
    }
    val want = Seq(
      replay(0L, docs.collect()(0).getString(1)),
      replay(1L, "alpha beta gamma delta"),
      replay(2L, "a b"),
      replay(3L, ""))
    assert(got === want)
  }
}
