package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VocabSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat"),
    (3L, ""),
    (4L, "unseen words here")).toDF("doc_id", "text")

  test("build: frequency-ranked ids, tie-break by token, minCount/maxSize knobs") {
    val v = Vocab.build(docs, "text", minCount = 2)
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._2)
    // counts: the=3, sat=2; everything else 1 → dropped
    assert(v === Seq(("the", 0L, 3L), ("sat", 1L, 2L)))
    val full = Vocab.build(docs, "text")
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._2)
    assert(full.head === ("the", 0L, 3L))
    assert(full(1) === ("sat", 1L, 2L))
    // ids 2.. are count-1 tokens in token order — deterministic
    assert(full.drop(2).map(_._1) === full.drop(2).map(_._1).sorted)
    assert(Vocab.build(docs, "text", maxSize = Some(3)).count() === 3)
  }

  test("encode: position order, OOV kept as -1, empty doc keeps empty sequence") {
    val v = Vocab.build(docs, "text", minCount = 2) // {the, sat}
    val got = Vocab.encode(docs, "doc_id", "text", v)
      .orderBy(col("doc_id"))
      .as[(Long, Seq[Long], Int, Int)].collect().toSeq
    assert(got === Seq(
      (1L, Seq(0L, -1L, 1L, -1L, 0L, -1L), 6, 3),
      (2L, Seq(0L, -1L, 1L), 3, 1),
      (3L, Seq.empty, 0, 0),
      (4L, Seq(-1L, -1L, -1L), 3, 3)))
  }

  test("property: decode round-trips in-vocab tokens; lengths always survive (seeded)") {
    val rnd = new scala.util.Random(77)
    val vocabWords = (0 until 12).map(i => s"w$i")
    val rows = (1 to 80).map { i =>
      i.toLong -> (0 until rnd.nextInt(15))
        .map(_ => vocabWords(rnd.nextInt(vocabWords.size))).mkString(" ")
    }
    val df = rows.toDF("doc_id", "text")
    val v = Vocab.build(df, "text")
    val idToTok = v.as[(String, Long, Long)].collect()
      .map(r => r._2 -> r._1).toMap
    val got = Vocab.encode(df, "doc_id", "text", v)
      .as[(Long, Seq[Long], Int, Int)].collect()
      .map(r => r._1 -> r).toMap
    rows.foreach { case (id, text) =>
      val toks = text.trim match {
        case "" => Seq.empty[String]
        case t  => t.split("\\s+").toSeq
      }
      val (_, ids, n, oov) = got(id)
      assert(n === toks.size, s"doc $id length")
      assert(oov === 0, s"doc $id all in vocab")
      assert(ids.map(idToTok) === toks, s"doc $id round-trip")
    }
  }
}
