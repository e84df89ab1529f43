package graft.operators

import graft.SparkSpec

class CdcChunkSpec extends SparkSpec {
  import spark.implicits._

  // driver reference: the same window-hash walk, plain Scala
  private def refCuts(text: String): List[Int] = {
    val n = text.length
    if (n == 0) return Nil
    val cuts = (0 to n - CdcChunk.W.toInt).filter { j =>
      var h = 0L
      for (k <- 0 until CdcChunk.W.toInt)
        h = (h * CdcChunk.B + text.charAt(j + k).toLong) % CdcChunk.M
      h % CdcChunk.D == 0L
    }.map(_ + CdcChunk.W.toInt).toList
    if (cuts.nonEmpty && cuts.last == n) cuts else cuts :+ n
  }

  private def refChunks(text: String): Seq[String] = {
    val cuts = refCuts(text)
    cuts.zip(0 +: cuts.dropRight(1)).map { case (e, s) =>
      text.substring(s, e)
    }
  }

  private def run(rows: Seq[(Long, String)]) =
    CdcChunk.chunks(rows.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, String, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))

  private def md5hex(s: String) =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("chunks reassemble to the document; short/empty docs behave") {
    val rnd = new scala.util.Random(42)
    val long = (1 to 2000).map(_ => ('a' + rnd.nextInt(26)).toChar)
      .mkString
    for (text <- Seq(long, "tiny", "exactly8", "", "twelve chars")) {
      val got = run(Seq((1L, text)))
      val want = refChunks(text)
      assert(got.map(_._3) === want.map(md5hex), s"text=${text.take(20)}")
      assert(got.map(_._4).sum === text.length.toLong)
      assert(got.map(_._2) === (1L to want.size.toLong))
      // the kernel's cut walk equals the per-position reference
      assert(CdcChunk.cutPositions(text) === refCuts(text))
    }
    assert(run(Seq((1L, ""))) === Seq.empty) // empty text: no chunks
    // a long doc actually splits (the divisor rule fires ~len/64 times)
    assert(run(Seq((1L, long))).size > 10)
  }

  test("insertion resilience: a prefix edit shares almost all chunks") {
    val rnd = new scala.util.Random(7)
    val doc = (1 to 4000).map(_ => ('a' + rnd.nextInt(26)).toChar)
      .mkString
    val edited = "EDITED:" + doc
    val a = refChunks(doc).map(md5hex).toSet
    val b = refChunks(edited).map(md5hex)
    val shared = b.count(a)
    // every chunk after the first re-synchronized cut is identical —
    // at most the head chunk(s) covering the 7-char edit differ (a
    // window touching the prefix can add one extra early cut, so the
    // tight bound is two unshared chunks)
    assert(shared >= b.size - 2 && shared > 10,
      s"$shared of ${b.size} shared")
    assert(shared < b.size) // the edited head chunk itself must differ
    // and the engine agrees with the reference on both docs
    val got = run(Seq((1L, doc), (2L, edited)))
    assert(got.filter(_._1 == 1L).map(_._3) === refChunks(doc).map(md5hex))
    assert(got.filter(_._1 == 2L).map(_._3) ===
      refChunks(edited).map(md5hex))
  }

  test("fixed-width shingling lacks the resilience CDC provides (contrast)") {
    // the same edit under fixed 64-char blocks: EVERY block shifts by
    // 7 chars, so nothing matches — the reason CDC exists
    val rnd = new scala.util.Random(9)
    val doc = (1 to 4000).map(_ => ('a' + rnd.nextInt(26)).toChar)
      .mkString
    val fixedA = doc.grouped(64).map(md5hex).toSet
    val fixedB = ("EDITED:" + doc).grouped(64).map(md5hex).toSeq
    assert(fixedB.count(fixedA) === 0)
  }

  test("null ids and null text drop") {
    val df = Seq[(java.lang.Long, String)]((1L, "some text here ok"),
      (null, "orphan"), (2L, null)).toDF("doc_id", "text")
    val got = CdcChunk.chunks(df, "doc_id", "text")
      .as[(Long, Long, String, Long)].collect()
    assert(got.map(_._1).toSet === Set(1L))
  }
}
