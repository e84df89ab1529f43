package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** L202 FLAC-walk pins: hand-assembled STREAMINFO parses exactly,
  * the violation contract (None, never garbage), the unknown-length
  * convention, block-skip arithmetic, the construction pin vs
  * hand-assembled bytes, sniff agreement, and a 200-id generator
  * round-trip replay. */
class FlacSpec extends SparkSpec {
  import spark.implicits._

  private def be16(x: Long) =
    Array(((x >> 8) & 0xff).toByte, (x & 0xff).toByte)
  private def be24(x: Long) = Array(((x >> 16) & 0xff).toByte,
    ((x >> 8) & 0xff).toByte, (x & 0xff).toByte)
  private def be64(x: Long) =
    (0 until 8).map(i => ((x >>> (56 - 8 * i)) & 0xff).toByte).toArray

  /** magic + STREAMINFO (flag per `last`) for the given params. */
  private def streamInfo(rate: Long, ch: Int, bps: Int, samples: Long,
      last: Boolean = true): Array[Byte] = {
    val u = (rate << 44) | ((ch - 1).toLong << 41) |
      ((bps - 1).toLong << 36) | samples
    "fLaC".getBytes("US-ASCII") ++
      Array((if (last) 0x80 else 0x00).toByte) ++ be24(34L) ++
      be16(1024L) ++ be16(4096L) ++ be24(512L) ++ be24(8192L) ++
      be64(u) ++ new Array[Byte](16)
  }

  test("hand-assembled STREAMINFO parses exactly") {
    val m = Flac.parseFlac(streamInfo(44100L, 2, 16, 441000L)).get
    assert(m === Flac.FlacMeta(2, 16, 44100L, 441000L, 1))
  }

  test("violation contract: None, never garbage") {
    val good = streamInfo(44100L, 2, 16, 441000L)
    assert(Flac.parseFlac(null) === None)
    assert(Flac.parseFlac("fLaX12345678".getBytes) === None,
      "bad magic")
    val notFirst = good.clone; notFirst(4) = 0x81.toByte // type 1 last
    assert(Flac.parseFlac(notFirst) === None,
      "first block must be STREAMINFO")
    val shortLen = "fLaC".getBytes ++ Array(0x80.toByte) ++
      be24(20L) ++ new Array[Byte](20)
    assert(Flac.parseFlac(shortLen) === None,
      "STREAMINFO must be exactly 34 bytes")
    assert(Flac.parseFlac(good.take(20)) === None, "truncated payload")
    assert(Flac.parseFlac(good.take(6)) === None, "truncated header")
    val noLast = streamInfo(44100L, 2, 16, 441000L, last = false)
    assert(Flac.parseFlac(noLast) === None,
      "stream ends before any last-flag block")
    assert(Flac.parseFlac(streamInfo(0L, 2, 16, 441000L)) === None,
      "rate 0 is spec-illegal")
  }

  test("totalSamples = 0 means UNKNOWN: metadata yes, duration NULL") {
    val bytes = streamInfo(48000L, 1, 24, 0L)
    val row = Flac.metadata(Seq((7L, bytes)).toDF("id", "content"),
      "id", "content").collect().head
    assert(row.getLong(3) === 48000L && row.getLong(4) === 0L)
    assert(row.isNullAt(5), "duration must be NULL, never 0")
  }

  test("later blocks skip by length arithmetic and count") {
    val padding = Array(0x01.toByte) ++ be24(6L) ++ new Array[Byte](6)
    val lastC = Array(0x84.toByte) ++ be24(12L) ++ new Array[Byte](12)
    val bytes = streamInfo(8000L, 1, 16, 16000L, last = false) ++
      padding ++ padding ++ lastC
    val m = Flac.parseFlac(bytes).get
    assert(m.nBlocks === 4 && m.sampleRate === 8000L)
    // trailing garbage past the last-flag block is ignored by design
    assert(Flac.parseFlac(bytes ++ Array(0x7f.toByte)).get
      .nBlocks === 4)
  }

  test("syntheticFlac construction pins byte-exactly to hand assembly") {
    val got = spark.range(2).select(col("id"),
        Flac.syntheticFlac(col("id") + 115L).as("b"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    // id 115: rate = RateValues(3) = 48000, ch = 1 + (28%2) = 1,
    // bps idx (14%2) = 0 → 16, samples 96000·(1 + 7%7) = 96000,
    // tail (115 DIV 112)%3 = 1 padding + last comment
    val padding = Array(0x01.toByte) ++ be24(6L) ++ new Array[Byte](6)
    val lastC = Array(0x84.toByte) ++ be24(12L) ++ new Array[Byte](12)
    val want115 = streamInfo(48000L, 1, 16, 96000L, last = false) ++
      padding ++ lastC
    assert(got(0L).toSeq === want115.toSeq)
    // id 116: rate = RateValues(0) = 8000, ch = 1 + (29%2) = 2,
    // bps (14%2) = 0 → 16, samples 96000·(1 + (7%7)) = 96000
    val want116 = streamInfo(8000L, 2, 16, 96000L, last = false) ++
      padding ++ lastC
    assert(got(1L).toSeq === want116.toSeq)
  }

  test("router agreement: syntheticFlac sniffs audio/flac") {
    val n = spark.range(50)
      .select(Multimodal.sniffType(Flac.syntheticFlac(col("id")))
        .as("t"))
      .filter(col("t") === "audio/flac").count()
    assert(n === 50L)
  }

  test("200-id generator round-trip replay") {
    val rows = Flac.metadata(
      spark.range(200).select(col("id"),
        Flac.syntheticFlac(col("id")).as("content")),
      "id", "content").collect()
    assert(rows.length === 200)
    for (r <- rows) {
      val id = r.getLong(0)
      val rate = Flac.RateValues((id % 4).toInt)
      val ch = 1L + (id / 4) % 2
      val bps = Flac.BpsValues(((id / 8) % 2).toInt)
      val samples = 96000L * (1 + (id / 16) % 7)
      assert(r.getLong(1) === ch, s"id $id channels")
      assert(r.getLong(2) === bps, s"id $id bps")
      assert(r.getLong(3) === rate, s"id $id rate")
      assert(r.getLong(4) === samples, s"id $id samples")
      assert(r.getLong(5) === samples * 1000L / rate, s"id $id dur")
      assert(r.getLong(6) === 2L + (id / 112) % 3, s"id $id blocks")
    }
  }
}
