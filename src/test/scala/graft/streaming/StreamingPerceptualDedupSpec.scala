package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Continuous perceptual dedup: dHash-banded history-aware admission,
  * smallest-id keeper in a batch, exactly-once history append. */
class StreamingPerceptualDedupSpec extends SparkSpec {
  import spark.implicits._

  // plain-Scala dHash (the MultimodalSpec reference, duplicated: specs
  // must not share private helpers)
  private def refHash(text: String): Long = {
    val n = text.length
    val lum = Array.tabulate(36) { k =>
      val start = k * n / 36; val end = (k + 1) * n / 36
      if (end <= start) 0L
      else Math.floorDiv(
        text.substring(start, end).map(_.toInt.toLong).sum, end - start)
    }
    (0 until 32).map { b =>
      val k1 = b / 8 * 9 + b % 8
      if (lum(k1) < lum(k1 + 1)) 1L << b else 0L
    }.sum
  }
  private def hd(a: String, b: String): Int =
    java.lang.Long.bitCount(refHash(a) ^ refHash(b))

  /** Conservative family-drop replay: fold batches in order; a doc is
    * dropped if within Hamming 3 of an admitted history doc or of any
    * smaller-id doc of its own batch. */
  private def refAdmit(batches: Seq[Seq[(Long, String)]]): Set[Long] = {
    val admitted = scala.collection.mutable.LinkedHashMap.empty[Long, String]
    for (batch <- batches) {
      val sorted = batch.sortBy(_._1)
      val blocked = sorted.filter { case (id, t) =>
        admitted.values.exists(hd(_, t) <= 3) ||
          sorted.exists { case (i2, t2) => i2 < id && hd(t2, t) <= 3 }
      }.map(_._1).toSet
      sorted.filterNot(d => blocked(d._1)).foreach { case (id, t) =>
        admitted(id) = t }
    }
    admitted.keySet.toSet
  }

  private val base = "The quick brown fox jumps over the lazy dog again " +
    "and again until the corpus repeats itself for forty lines or so."
  private val variant = base.replace("quick", "quack")
  private val far1 = base.reverse
  private val far2 = "z" * 120

  test("batch kernel: in-batch keeper, history blocking, replay admits 0") {
    // preconditions the fixture relies on — checked, not assumed
    assert(hd(base, variant) <= 3 && hd(base, far1) > 3
      && hd(base, far2) > 3)
    val hist = tmpDir("spd")
    val b1 = Seq((1L, base), (2L, base), (3L, far1)).toDF("doc_id", "text")
    val s1 = StreamingPerceptualDedup.dedupBatch(b1, hist, 1)
    assert(s1.in == 3 && s1.dupOfHistory == 0 && s1.dupInBatch == 1
      && s1.admitted == 2, s1.toString)

    val b2 = Seq((4L, base), (5L, variant), (6L, far2))
      .toDF("doc_id", "text")
    val s2 = StreamingPerceptualDedup.dedupBatch(b2, hist, 2)
    assert(s2.dupOfHistory == 2 && s2.dupInBatch == 0 && s2.admitted == 1,
      s2.toString)

    // replayed micro-batch: 4 and 5 still blocked by 1; 6 now IS history
    // (self-pair at Hamming 0) — exactly-once, nothing inserted
    val s3 = StreamingPerceptualDedup.dedupBatch(b2, hist, 2)
    assert(s3.dupOfHistory == 3 && s3.admitted == 0, s3.toString)

    val ids = spark.read.parquet(s"$hist/hashes")
      .select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L, 6L), s"history holds $ids")
    // the stored hashes are the reference hashes
    val stored = spark.read.parquet(s"$hist/hashes")
      .select("id", "ph").as[(Long, Long)].collect().toMap
    assert(stored(1L) == refHash(base) && stored(3L) == refHash(far1))
  }

  test("multi-batch stream equals the conservative family-drop replay") {
    val words = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")
    val rnd = new scala.util.Random(43)
    def mkDoc(i: Int): String =
      (0 until 24).map(_ => words(rnd.nextInt(words.length)))
        .mkString(" ")
    // 12 random docs + near variants, exact dups and fresh docs spread
    // over 3 batches; whatever chance collisions the 12-word vocabulary
    // produces, the reference replay defines the truth
    val bases = (1 to 12).map(i => i.toLong -> mkDoc(i))
    val all = bases ++ Seq(
      13L -> bases(0)._2.replaceFirst("[a-z]+", "zq"), // edit of doc 1
      14L -> mkDoc(99), 15L -> mkDoc(98), // fresh random docs
      16L -> bases(0)._2, // exact dup of doc 1
      17L -> bases(4)._2.replaceFirst("[a-z]+", "xxj")) // edit of doc 5
    val batches = all.grouped(6).map(_.toSeq).toSeq
    val hist = tmpDir("spd_ref")
    val stats = batches.zipWithIndex.map { case (b, i) =>
      StreamingPerceptualDedup.dedupBatch(b.toDF("doc_id", "text"),
        hist, i.toLong)
    }
    val got = spark.read.parquet(s"$hist/hashes")
      .select("id").as[Long].collect().toSet
    assert(got === refAdmit(batches))
    assert(stats.map(_.admitted).sum === got.size.toLong)
  }

  test("dedupSink end-to-end over a MemoryStream") {
    val hist = tmpDir("spd_stream")
    val stats = new java.util.concurrent.ConcurrentLinkedQueue[
      StreamingPerceptualDedup.BatchStats]
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = StreamingPerceptualDedup.dedupSink(docs, hist,
        onBatch = stats.add(_)).start()
    try {
      input.addData((1L, base), (2L, variant))
      q.processAllAvailable()
      input.addData((3L, base), (4L, far2))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.read.parquet(s"$hist/hashes")
      .select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 4L), s"stream admitted $ids")
    val byBatch = stats.toArray(
      Array.empty[StreamingPerceptualDedup.BatchStats]).sortBy(_.batchId)
    assert(byBatch.map(s => (s.in, s.dupOfHistory, s.dupInBatch,
      s.admitted)).toSeq === Seq((2L, 0L, 1L, 1L), (2L, 1L, 0L, 1L)))
  }
}
