package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** L176 MP3/ID3v2 header walk (r15): hand-assembled frames, syncsafe
  * tag arithmetic, the bounded resync scan, the violation
  * conventions, and the synthetic-generator byte-layout pin that
  * ties the oracle's formula replay to the actual bytes. */
class Mp3HeaderSpec extends SparkSpec {
  import spark.implicits._

  private def hexBytes(h: String): Array[Byte] =
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def parse(h: String) = Mp3Header.parseMp3(hexBytes(h))

  test("bare V1L3 frame: bitrate/samplerate/channel tables decode") {
    // FF FB: MPEG1 Layer III; byte2 0x92 = idx 9 (128 kbps), sr 0
    // (44100); byte3 0xC0 = mode 3 (mono)
    val m = parse("FFFB92C0" + "00000000").get
    assert(m.id3Size === 0L && m.version === "1" && m.layer === 3)
    assert(m.bitrateKbps === Some(128L))
    assert(m.sampleRate === Some(44100L) && m.channels === 1)
  }

  test("ID3v2 tag skipped by syncsafe arithmetic, incl. the 7-bit carry") {
    // tag size 0x0180 syncsafe = bytes 03 00 → 0x180 = 384; total 394
    val tag = "494433040000" + "00000300" + ("00" * 384)
    val m = parse(tag + "FFFB92C0").get
    assert(m.id3Size === 394L && m.bitrateKbps === Some(128L))
    // a non-syncsafe size byte (high bit) is a violation
    assert(parse("494433040000" + "00000080" + "FFFB92C0").isEmpty)
  }

  test("zero padding before the frame: the bounded scan resyncs") {
    val m = parse(("00" * 37) + "FFFB94C0").get
    assert(m.bitrateKbps === Some(128L) && m.sampleRate === Some(48000L))
  }

  test("violations parse to None, never garbage") {
    assert(parse("FFFBF0C0" + "00000000").isEmpty) // bitrate idx 15
    assert(parse("FFFB00C0" + "00000000").isEmpty) // bitrate idx 0 (free)
    assert(parse("FFFB9CC0" + "00000000").isEmpty) // samplerate idx 3
    assert(parse("FFEB92C0" + "00000000").isEmpty) // reserved version
    assert(parse("FFF992C0" + "00000000").isEmpty) // reserved layer
    assert(parse("FEFB92C0" + "00000000").isEmpty) // broken sync
    assert(parse("FFFB92").isEmpty)                // truncated header
  }

  test("non-V1L3 frames parse version/layer but NULL the bitrate (stated scope)") {
    // FF F3: MPEG2 (bits 10), Layer III — tables differ, bitrate None
    val m = parse("FFF392C0" + "00000000").get
    assert(m.version === "2" && m.layer === 3)
    assert(m.bitrateKbps === None && m.sampleRate === None)
  }

  test("syntheticMp3 byte layout matches the hand assembly (the oracle tie)") {
    // id = 7: ID3 present (7%3=1), tag payload 7, pad 7%5=2 zeros,
    // bitrate idx 8 (112 kbps), sr idx 1 (48000), mode 3 (mono)
    val blob = Seq(Tuple1(7L)).toDF("doc_id")
      .select(hex(Mp3Header.syntheticMp3(col("doc_id"))).as("h"))
      .collect().head.getString(0)
    val want = "494433040000" + "00000007" + ("00" * 7) +
      "0000" + "FFFB" + "84" + "C0" + "00000000"
    assert(blob === want)
    val m = parse(blob).get
    assert(m.id3Size === 17L && m.bitrateKbps === Some(112L))
    assert(m.sampleRate === Some(48000L) && m.channels === 1)
  }
}
