package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** L177 audio quality audit (r15): hand-built PCM WAVs with exact
  * peak/clip/silence counts, the mono-mix de-clip convention, the
  * violation contract, and the syntheticWav byte-layout pin tying
  * the oracle's formula replay to actual bytes the JDK must parse. */
class AudioQualitySpec extends SparkSpec {
  import spark.implicits._

  /** Canonical 44-byte WAV header + 16-bit LE PCM samples. */
  private def wav(samples: Seq[Int], channels: Int = 1,
      rate: Int = 8000): Array[Byte] = {
    val data = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { data.write(v & 0xff); data.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    def tag(s: String): Unit = data.write(s.getBytes("US-ASCII"))
    val byteLen = samples.length * 2
    tag("RIFF"); le32(36 + byteLen); tag("WAVE"); tag("fmt ")
    le32(16); le16(1); le16(channels); le32(rate)
    le32(rate * channels * 2); le16(channels * 2); le16(16)
    tag("data"); le32(byteLen)
    samples.foreach(le16)
    data.toByteArray
  }

  test("hand PCM: exact peak, clip and silence counts at the pinned thresholds") {
    // samples: 0 (silent), 255 (silent — below 256), 256 (neither),
    // 32511 (not clipped), 32512 (clipped), -32768 (clipped)
    val q = Multimodal.audioQuality(
      wav(Seq(0, 255, 256, 32511, 32512, -32768))).get
    assert(q.nFrames === 6L && q.peak === 32768L)
    assert(q.nClipped === 2L && q.nSilent === 2L)
    assert(Multimodal.ClipLevel === 32512L &&
      Multimodal.SilenceLevel === 256L)
  }

  test("mono-mix convention: out-of-phase stereo clipping de-clips (stated)") {
    // one stereo frame (+32767, -32767): the floor-mean mix is 0 —
    // silent, not clipped; the scaladoc states exactly this
    val q = Multimodal.audioQuality(
      wav(Seq(32767, -32767), channels = 2)).get
    assert(q.channels === 2 && q.nFrames === 1L)
    assert(q.nClipped === 0L && q.nSilent === 1L)
  }

  test("violations: truncated header and non-audio bytes read None") {
    val whole = wav(Seq(1000, -1000))
    assert(Multimodal.audioQuality(whole.take(12)).isEmpty)
    assert(Multimodal.audioQuality("not audio".getBytes).isEmpty)
    assert(Multimodal.audioQuality(Array.emptyByteArray).isEmpty)
  }

  test("syntheticWav: byte layout matches the hand writer; decode inverts it") {
    // id = 7: n = 64 + 2·(7%19) = 78 frames, a = 1024·7 = 7168
    val blob = Seq(Tuple1(7L)).toDF("doc_id")
      .select(Multimodal.syntheticWav(col("doc_id")).as("b"))
      .collect().head.getAs[Array[Byte]](0)
    val want = wav((0 until 78).map(i => if (i % 2 == 0) 7168 else -7168))
    assert(blob.toSeq === want.toSeq)
    val q = Multimodal.audioQuality(blob).get
    assert(q.sampleRateHz === 8000 && q.nFrames === 78L)
    assert(q.peak === 7168L && q.nClipped === 0L && q.nSilent === 0L)
  }

  test("syntheticWav edges: silent, clipped and truncated ids") {
    val rows = Seq(33L, 32L, 23L).toDF("doc_id") // a=0; a=32767; truncated
      .select(col("doc_id"), Multimodal.syntheticWav(col("doc_id")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val silent = Multimodal.audioQuality(rows(33L)).get
    assert(silent.peak === 0L && silent.nSilent === silent.nFrames)
    val clipped = Multimodal.audioQuality(rows(32L)).get
    assert(clipped.peak === 32767L && clipped.nClipped === clipped.nFrames)
    assert(Multimodal.audioQuality(rows(23L)).isEmpty)
  }
}
