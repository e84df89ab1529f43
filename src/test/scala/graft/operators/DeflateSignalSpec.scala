package graft.operators

import java.util.zip.{Deflater, Inflater}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deflate-ratio quality signal (r13, L137). The battery entry is
  * rows-only (DuckDB cannot deflate), so THIS spec is the semantic
  * gate: an in-JVM reference replay of the exact kernel (same level,
  * same nowrap framing), inflate round-trips proving the measured
  * stream is a real deflate stream, the repetition/gibberish ordering
  * the signal exists for, the once-quantized ratio identity, state
  * isolation under Deflater reuse, and byte-not-char length
  * semantics. */
class DeflateSignalSpec extends SparkSpec {
  import spark.implicits._

  /** The kernel replayed in plain Scala — same params, fresh Deflater. */
  private def refDeflate(text: String, level: Int = 6): Array[Byte] = {
    val raw = text.getBytes("UTF-8")
    val d = new Deflater(level, true)
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(bytes: Array[Byte], rawLen: Int): Array[Byte] = {
    val inf = new Inflater(true)
    inf.setInput(bytes)
    val out = new Array[Byte](rawLen)
    val n = inf.inflate(out)
    assert(inf.finished() && n === rawLen, "inflate must restore all bytes")
    inf.end()
    out
  }

  private val docs = Seq(
    1L -> "ab" * 500,                                  // pure repetition
    2L -> {                                            // gibberish
      val rnd = new scala.util.Random(42)
      (0 until 1000).map(_ => (rnd.nextInt(94) + 33).toChar).mkString
    },
    3L -> ("the quick brown fox jumps over the lazy dog. " * 20),
    4L -> "é" * 100,                                   // 2-byte UTF-8
    5L -> "")                                          // empty

  private def run() =
    DeflateSignal.ratios(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap

  test("n_deflate equals the in-JVM reference replay; streams inflate back") {
    val got = run()
    for ((id, text) <- docs if text.nonEmpty) {
      val ref = refDeflate(text)
      assert(got(id)._2 === ref.length.toLong, s"doc $id deflate size")
      assert(inflate(ref, text.getBytes("UTF-8").length).toSeq ===
        text.getBytes("UTF-8").toSeq, s"doc $id round-trip")
    }
  }

  test("ratio is the once-quantized floor(1e6 * n_deflate / n_raw)") {
    for ((id, (nRaw, nDef, ratio)) <- run() if nRaw > 0)
      assert(ratio === Some(1000000L * nDef / nRaw), s"doc $id")
  }

  test("repetition compresses far below prose; gibberish far above") {
    val got = run()
    val rep = got(1L)._3.get; val gib = got(2L)._3.get
    val prose = got(3L)._3.get
    assert(rep < 100000L, s"repetition ratio $rep should be < 0.1e6")
    assert(gib > 700000L, s"gibberish ratio $gib should be > 0.7e6")
    assert(rep < prose && prose < gib,
      s"ordering must hold: $rep < $prose < $gib")
  }

  test("UTF-8 BYTE length, not char length") {
    val got = run()
    assert(got(4L)._1 === 200L, "100 two-byte chars = 200 bytes")
  }

  test("empty text: (0, 0, null) — defined, no division") {
    assert(run()(5L) === ((0L, 0L, None)))
  }

  test("per-partition Deflater reuse leaks no state between docs") {
    // every doc forced into ONE partition (worst case for state leak):
    // each row's numbers must equal its solo run
    val batch = DeflateSignal.ratios(
        docs.toDF("doc_id", "text").repartition(1), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    for ((id, text) <- docs) {
      val solo = DeflateSignal.ratios(
          Seq(id -> text).toDF("doc_id", "text"), "doc_id", "text")
        .collect().head.getLong(2)
      assert(batch(id) === solo, s"doc $id batch-vs-solo")
    }
  }

  test("null ids and texts drop; level is guarded") {
    val df = Seq((Some(1L), Some("x")), (None, Some("y")),
      (Some(3L), None)).toDF("doc_id", "text")
    assert(DeflateSignal.ratios(df, "doc_id", "text").count() === 1L)
    intercept[IllegalArgumentException] {
      DeflateSignal.ratios(df, "doc_id", "text", level = 0)
    }
  }

  test("idCol colliding with an output name is guarded (Reserved)") {
    // ADVICE r13: an idCol literally named n_raw/n_deflate/ratio_e6
    // would produce a duplicate-named output column — fail fast instead
    val df = Seq((1L, "x")).toDF("ratio_e6", "text")
    val e = intercept[IllegalArgumentException] {
      DeflateSignal.ratios(df, "ratio_e6", "text")
    }
    assert(e.getMessage.contains("reserves column name"))
  }
}
