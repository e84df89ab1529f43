package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.CdcChunk

/** Chunk-novelty admission: CDC digest history, conservative in-batch
  * owners, exact integer threshold, exactly-once appends. */
class StreamingCdcDedupSpec extends SparkSpec {
  import spark.implicits._

  // plain-Scala chunk digests via the operator's own cut rule — the
  // digests themselves are pinned engine ≡ oracle in CdcChunkSpec; this
  // spec pins the ADMISSION protocol on top of them
  private def digests(text: String): Set[String] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val cuts = CdcChunk.cutPositions(text)
    var start = 0
    cuts.map { cut =>
      val chunk = text.substring(start, cut)
      start = cut
      md.digest(chunk.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }.toSet
  }

  /** Reference replay: fold batches in order; doc d is admitted iff
    * novel·1000 ≥ t·total, novel counting digests neither in the
    * admitted history nor owned by a smaller-id doc of d's batch. */
  private def refAdmit(batches: Seq[Seq[(Long, String)]],
      thresholdMilli: Int = 500): Set[Long] = {
    val history = scala.collection.mutable.Set.empty[String]
    val out = scala.collection.mutable.Set.empty[Long]
    for (batch <- batches) {
      val ds = batch.map { case (id, t) => id -> digests(t) }.toMap
      val admittedNow = batch.sortBy(_._1).collect {
        case (id, _) if ds(id).nonEmpty && {
          val total = ds(id).size
          val novel = ds(id).count(g => !history.contains(g) &&
            !batch.exists { case (i2, _) => i2 < id && ds(i2).contains(g) })
          novel * 1000 >= thresholdMilli * total
        } => id
      }
      out ++= admittedNow
      admittedNow.foreach(id => history ++= ds(id))
    }
    out.toSet
  }

  // ~190-char base so CDC yields a handful of ~64-char chunks; the
  // edited copy shares all but the first chunk or two (CdcChunkSpec's
  // insertion-resilience pin)
  private val base = (1 to 12).map(i =>
    s"sentence ${i * 37} nr${i * i} keeps w${i * 13 % 7} moving al$i")
    .mkString(" ")
  private val edited = "EDITED:" + base
  private val fresh = (1 to 12).map(i =>
    s"other ${i * 41} mat${i * i + 5} line q${i * 17 % 9} words zz$i")
    .mkString(" ")

  private def admittedIds(hist: String): Set[Long] =
    spark.read.parquet(s"$hist/admitted").select("id").as[Long]
      .collect().toSet

  test("fixture preconditions: edit shares most chunks, fresh shares none") {
    val (b, e, f) = (digests(base), digests(edited), digests(fresh))
    assert(b.size >= 3)
    // the edited copy is mostly-shared: novelty strictly under 50%
    assert((e -- b).size * 1000 < 500 * e.size, s"${(e -- b).size}/${e.size}")
    assert((f & b).isEmpty)
  }

  test("batch kernel: novelty gate, conservative owners, replay admits 0") {
    val hist = tmpDir("cdc1")
    // batch 0: base admitted; edited blocked by base's chunks even
    // though they arrive in the same batch (smaller-id owner rule)
    val s0 = StreamingCdcDedup.dedupBatch(
      Seq((1L, base), (2L, edited)).toDF("doc_id", "text"), hist, 0L)
    assert((s0.in, s0.admitted) === (2L, 1L))
    assert(admittedIds(hist) === Set(1L))
    // batch 1: replay of base blocked by history; fresh admitted
    val s1 = StreamingCdcDedup.dedupBatch(
      Seq((3L, base), (4L, fresh)).toDF("doc_id", "text"), hist, 1L)
    assert((s1.in, s1.admitted) === (2L, 1L))
    assert(admittedIds(hist) === Set(1L, 4L))
    // exact replay of batch 1: admits 0, inserts 0 digests
    val s2 = StreamingCdcDedup.dedupBatch(
      Seq((3L, base), (4L, fresh)).toDF("doc_id", "text"), hist, 2L)
    assert((s2.admitted, s2.newDigests) === (0L, 0L))
    assert(admittedIds(hist) === Set(1L, 4L))
  }

  test("conservative rule: a dropped smaller-id owner still blocks") {
    val hist = tmpDir("cdc2")
    // seed history with base → doc 10 (edited) will be DROPPED; doc 11
    // (also edited) is then blocked by 10's chunks anyway — and 10's
    // unshared prefix chunk does not rescue 11 either
    StreamingCdcDedup.dedupBatch(
      Seq((1L, base)).toDF("doc_id", "text"), hist, 0L)
    val s = StreamingCdcDedup.dedupBatch(
      Seq((10L, edited), (11L, edited)).toDF("doc_id", "text"), hist, 1L)
    assert(s.admitted === 0L)
    assert(admittedIds(hist) === Set(1L))
  }

  test("chunk-less docs are not admitted (and keep replay-admits-0 total)") {
    val hist = tmpDir("cdc3")
    val s = StreamingCdcDedup.dedupBatch(
      Seq((1L, ""), (2L, base)).toDF("doc_id", "text"), hist, 0L)
    assert((s.in, s.admitted) === (1L, 1L)) // empty doc yields no chunks
    assert(admittedIds(hist) === Set(2L))
  }

  test("crash ordering self-heals: lost digest table is rebuilt on replay") {
    val hist = tmpDir("cdc4")
    StreamingCdcDedup.dedupBatch(
      Seq((1L, base), (2L, fresh)).toDF("doc_id", "text"), hist, 0L)
    // simulate the crash window: admitted table persisted, digests lost
    val p = new Path(s"$hist/digests")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    val s = StreamingCdcDedup.dedupBatch(
      Seq((1L, base), (2L, fresh)).toDF("doc_id", "text"), hist, 1L)
    // re-admission is idempotent (0 new admitted rows), digests restored
    assert(s.admitted === 0L)
    assert(s.newDigests > 0L)
    assert(admittedIds(hist) === Set(1L, 2L))
    val n = spark.read.parquet(s"$hist/digests").count()
    assert(n === (digests(base) ++ digests(fresh)).size)
  }

  test("property: multi-batch protocol equals the reference replay (seeded)") {
    val rnd = new scala.util.Random(71)
    val pool = Vector(base, edited, fresh,
      "EDITED:" + fresh, base + " tail addition", fresh.reverse)
    val batches = Seq.fill(3)(Seq.fill(4)(
      (rnd.nextLong(1000).abs, pool(rnd.nextInt(pool.size)))))
      .map(_.distinctBy(_._1))
    val hist = tmpDir("cdc5")
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingCdcDedup.dedupBatch(b.toDF("doc_id", "text"), hist, i.toLong)
    }
    assert(admittedIds(hist) === refAdmit(batches))
  }

  test("dedupSink end-to-end over a MemoryStream") {
    val hist = tmpDir("cdc6")
    val stats = new java.util.concurrent.ConcurrentLinkedQueue[
      StreamingCdcDedup.BatchStats]
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = StreamingCdcDedup.dedupSink(docs, hist,
        onBatch = stats.add(_)).start()
    try {
      input.addData((1L, base), (2L, edited))
      q.processAllAvailable()
      input.addData((3L, base), (4L, fresh))
      q.processAllAvailable()
    } finally q.stop()
    assert(admittedIds(hist) === Set(1L, 4L))
    val byBatch = stats.toArray(
      Array.empty[StreamingCdcDedup.BatchStats]).sortBy(_.batchId)
    assert(byBatch.map(s => (s.in, s.admitted)).toSeq ===
      Seq((2L, 1L), (2L, 1L)))
  }

  test("guard: threshold domain") {
    intercept[IllegalArgumentException] {
      StreamingCdcDedup.dedupBatch(
        Seq((1L, base)).toDF("doc_id", "text"), tmpDir("cdc7"),
        thresholdMilli = 0)
    }
  }
}
