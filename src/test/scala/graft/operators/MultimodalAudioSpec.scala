package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream,
  AudioSystem}

import graft.SparkSpec

/** REAL audio decode for the perceptual family (r13, VERDICT r12 #3 —
  * the audio half of r12's stub→real image closure). This is the spec
  * GATE for the kernel DuckDB cannot oracle (WAV parse): hand-computed
  * PCM fixtures pin the decode → mono mix → 33-cell energy box-mean →
  * fingerprint chain, cross-format WAV ≡ AIFF ≡ AU agreement pins the
  * container independence, and the end-to-end test proves q_m6's
  * banding machinery accepts really-decoded fingerprints unchanged. */
class MultimodalAudioSpec extends SparkSpec {
  import spark.implicits._

  private val Cells = 33 // Multimodal.AudioCells

  /** Encode 16-bit signed mono samples as audio-file bytes in the
    * given container (WAVE little-endian; AIFF big-endian; AU
    * big-endian) — the JDK writer handles the byte order, so a decoded
    * grid that matches across all three pins endianness handling. */
  private def encode(samples: Array[Int],
      fmt: AudioFileFormat.Type): Array[Byte] = {
    val big = fmt != AudioFileFormat.Type.WAVE
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      val lo = (s & 0xff).toByte; val hi = ((s >> 8) & 0xff).toByte
      if (big) { pcm(2 * i) = hi; pcm(2 * i + 1) = lo }
      else { pcm(2 * i) = lo; pcm(2 * i + 1) = hi }
    }
    val af = new AudioFormat(8000f, 16, 1, true, big)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(new ByteArrayInputStream(pcm),
      af, samples.length.toLong), fmt, bos)
    bos.toByteArray
  }

  test("1-frame-per-cell clip: the energy grid IS the |sample| vector") {
    // 33 frames, one per cell — hand-readable alternating-sign ramp
    val samples = Array.tabulate(Cells)(k => if (k % 2 == 0) 100 * k
      else -(100 * k))
    val d = Multimodal.decodeAudio(
      encode(samples, AudioFileFormat.Type.WAVE)).get
    assert(d.sampleRateHz === 8000 && d.channels === 1
      && d.nFrames === Cells.toLong)
    assert(d.energy33.toSeq === samples.map(s => math.abs(s).toLong).toSeq)
  }

  test("block-constant tone ladder: box means are exact; bits hand-check") {
    // 33 blocks of 4 frames each, block k constant at 50*k: cell k
    // mean is exactly 50*k, strictly increasing -> all 32 bits set
    val inc = Array.tabulate(Cells * 4)(i => 50 * (i / 4))
    val dInc = Multimodal.decodeAudio(
      encode(inc, AudioFileFormat.Type.WAVE)).get
    assert(dInc.energy33.toSeq === (0 until Cells).map(k => 50L * k))
    assert(Multimodal.audioFingerprintBits(dInc.energy33) === 0xFFFFFFFFL)
    // flat tone -> no cell quieter than its successor -> zero
    val flat = Array.fill(Cells * 4)(1234)
    val dFlat = Multimodal.decodeAudio(
      encode(flat, AudioFileFormat.Type.WAVE)).get
    assert(Multimodal.audioFingerprintBits(dFlat.energy33) === 0L)
  }

  test("non-divisible clip: floor slice boundaries, floor means") {
    // 5 frames over 33 cells — most slices empty (energy 0), the five
    // occupied cells are k*5/33 boundaries; replay them by hand
    val samples = Array(1000, -2000, 3000, -4000, 5000)
    val d = Multimodal.decodeAudio(
      encode(samples, AudioFileFormat.Type.WAVE)).get
    val expected = Array.tabulate(Cells) { k =>
      val s = k * 5 / 33; val e = (k + 1) * 5 / 33
      if (e > s) (s until e).map(i => math.abs(samples(i)).toLong).sum /
        (e - s)
      else 0L
    }
    assert(d.energy33.toSeq === expected.toSeq)
  }

  test("cross-format: WAV == AIFF == AU on the same samples") {
    val samples = Array.tabulate(200)(i => (i * 331) % 4000 - 2000)
    val w = Multimodal.decodeAudio(encode(samples,
      AudioFileFormat.Type.WAVE)).get
    val a = Multimodal.decodeAudio(encode(samples,
      AudioFileFormat.Type.AIFF)).get
    val u = Multimodal.decodeAudio(encode(samples,
      AudioFileFormat.Type.AU)).get
    assert(w.energy33.toSeq === a.energy33.toSeq)
    assert(w.energy33.toSeq === u.energy33.toSeq)
    assert(w.nFrames === 200L && a.nFrames === 200L && u.nFrames === 200L)
  }

  test("stereo mixes by integer floor-mean of the channels") {
    // interleaved L/R frames; mono(i) = floorDiv(L+R, 2). Frame 1 mixes
    // (101, 100) -> floor(201/2) = 100; frame 2 (-101, 100) -> -1
    val lr = Array(101, 100, -101, 100, 500, -500)
    val pcm = new Array[Byte](lr.length * 2)
    lr.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val af = new AudioFormat(8000f, 16, 2, true, false)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(new ByteArrayInputStream(pcm),
      af, 3L), AudioFileFormat.Type.WAVE, bos)
    val d = Multimodal.decodeAudio(bos.toByteArray).get
    assert(d.channels === 2 && d.nFrames === 3L)
    // 3 frames over 33 cells: occupied cells hold |100|, |-1|, |0|
    val mono = Array(100L, -1L, 0L)
    val expected = Array.tabulate(Cells) { k =>
      val s = k * 3 / 33; val e = (k + 1) * 3 / 33
      if (e > s) math.abs(mono(s)) else 0L
    }
    assert(d.energy33.toSeq === expected.toSeq)
  }

  test("8-bit unsigned render lands on the 16-bit grid (x256 scale)") {
    // same block-constant tone written 8-bit unsigned: sample k/4 at
    // amplitude g scales to (g - 128) << 8 in the mono domain
    val g8 = Array.tabulate(Cells * 4)(i => 128 + (i / 4) % 120)
    val pcm = g8.map(v => (v & 0xff).toByte)
    val af = new AudioFormat(8000f, 8, 1, false, false)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(new ByteArrayInputStream(pcm),
      af, g8.length.toLong), AudioFileFormat.Type.WAVE, bos)
    val d = Multimodal.decodeAudio(bos.toByteArray).get
    assert(d.energy33.toSeq ===
      (0 until Cells).map(k => (k % 120).toLong << 8))
  }

  test("undecodable bytes return None; the kernel drops them") {
    assert(Multimodal.decodeAudio(null).isEmpty)
    assert(Multimodal.decodeAudio(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeAudio("not a wav".getBytes("UTF-8")).isEmpty)
    // truncated container: header only
    val whole = encode(Array.tabulate(100)(i => i * 7), AudioFileFormat.Type.WAVE)
    assert(Multimodal.decodeAudio(whole.take(8)).isEmpty)
  }

  test("end-to-end: kernel fingerprints feed q_m6's banding unchanged") {
    val toneA = Array.tabulate(Cells * 2)(i => 40 * (i / 2))
    // a near-dup of toneA: one cell's level nudged -> <=3 bits differ
    val toneB = toneA.clone(); toneB(20) = toneA(20) + 90; toneB(21) = toneB(20)
    val toneC = Array.tabulate(Cells * 2)(i =>
      if ((i / 2) % 2 == 0) 4000 else 10) // sawtooth — far from A
    val rows = Seq(
      (1L, encode(toneA, AudioFileFormat.Type.WAVE)),
      (2L, encode(toneB, AudioFileFormat.Type.WAVE)),
      (3L, encode(toneC, AudioFileFormat.Type.WAVE)),
      (4L, "junk-not-audio".getBytes("UTF-8")))
    val df = rows.toDF("doc_id", "content")
    val hashes = Multimodal.audioFingerprintKernel(df, "doc_id")
    val got = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === Set(1L, 2L, 3L), "undecodable row dropped")
    assert(java.lang.Long.bitCount(got(1L) ^ got(2L)) <= 3,
      s"near-dup pair too far: ${got(1L)} vs ${got(2L)}")
    val pairs = Multimodal.perceptualNearDupFromHashes(hashes)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 1L)),
      s"banding machinery must surface the near-dup pair, got $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "the far tone must not pair")
  }
}
