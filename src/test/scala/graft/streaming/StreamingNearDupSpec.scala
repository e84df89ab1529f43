package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Continuous near-dup filtering: history-aware admission, smallest-id
  * keeper within a batch, exactly-once history append (replay admits 0). */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val base = (1 to 40).map(i => s"w$i")
  private def doc(id: Long, words: Seq[String]) = (id, words.mkString(" "))
  // one substituted word in 40 → 3-shingle Jaccard ≈ 35/41 ≈ 0.85

  test("batch kernel: in-batch keeper, history blocking, replay admits 0") {
    val hist = tmpDir("snd")
    val b1 = Seq(
      doc(1, base),                            // A — keeper
      doc(2, (1 to 40).map(i => s"x$i")),      // B — unrelated
      doc(3, base.updated(20, "CHANGED"))      // C ≈ A, larger id → dropped
    ).toDF("doc_id", "text")
    val s1 = StreamingNearDup.dedupBatch(b1, hist, batchId = 1,
      threshold = 0.7)
    assert(s1.in == 3 && s1.dupOfHistory == 0 && s1.dupInBatch == 1
      && s1.admitted == 2, s1.toString)

    val b2 = Seq(
      doc(4, base.updated(5, "ALTERED")),      // D ≈ A (history) → dropped
      doc(5, (1 to 40).map(i => s"z$i"))       // E — new → admitted
    ).toDF("doc_id", "text")
    val s2 = StreamingNearDup.dedupBatch(b2, hist, 2, threshold = 0.7)
    assert(s2.dupOfHistory == 1 && s2.dupInBatch == 0 && s2.admitted == 1,
      s2.toString)

    // replayed micro-batch: D still blocked by A; E now IS history (J=1
    // with itself) → everything dedups, nothing inserted — exactly-once
    val s3 = StreamingNearDup.dedupBatch(b2, hist, 2, threshold = 0.7)
    assert(s3.dupOfHistory == 2 && s3.admitted == 0, s3.toString)

    val ids = spark.read.parquet(s"$hist/shingles")
      .select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 5L), s"history holds $ids")
  }

  test("int doc ids: history probe hashes the same type the store was written with") {
    // regression: xxhash64(IntegerType) != xxhash64(LongType). The shingle
    // store is bucketed on id at write time but pruned via the pair
    // table's id_a (always long) — without the long normalization an
    // int-id batch writes buckets the prober never reads, allSh misses the
    // history shingles, and history near-dups are silently ADMITTED.
    import org.apache.spark.sql.functions.col
    val hist = tmpDir("snd_int_ids")
    val b1 = Seq((1, base.mkString(" ")), (2, (1 to 40).map(i => s"x$i").mkString(" ")))
      .toDF("doc_id", "text") // IntegerType ids
    assert(b1.schema("doc_id").dataType ==
      org.apache.spark.sql.types.IntegerType)
    val s1 = StreamingNearDup.dedupBatch(b1, hist, 1, threshold = 0.7)
    assert(s1.admitted == 2, s1.toString)

    val b2 = Seq((3, base.updated(5, "ALTERED").mkString(" "))) // ≈ doc 1
      .toDF("doc_id", "text")
    val s2 = StreamingNearDup.dedupBatch(b2, hist, 2, threshold = 0.7)
    assert(s2.dupOfHistory == 1 && s2.admitted == 0,
      s"history near-dup with int ids must be blocked: $s2")
    // the store itself holds long ids regardless of the batch's dtype
    assert(spark.read.parquet(s"$hist/shingles").schema("id").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(spark.read.parquet(s"$hist/bands").schema("id").dataType ==
      org.apache.spark.sql.types.LongType)
    val ids = spark.read.parquet(s"$hist/shingles")
      .select(col("id")).as[Long].collect().toSet
    assert(ids == Set(1L, 2L), s"history holds $ids")
  }

  test("bucketed history: band probe reads ONLY the batch's bucket dirs (input_file_name)") {
    import org.apache.spark.sql.functions._
    import graft.operators.{IdempotentAppend, NearDup}
    val hist = tmpDir("snd_buckets")
    // many unrelated docs spread band keys across buckets; few bands per
    // doc (4) vs many buckets (64) so a 1-doc batch touches ≤4 dirs
    val corpus = (1 to 30).map(i =>
      doc(i.toLong, (1 to 40).map(j => s"c${i}w$j"))).toDF("doc_id", "text")
    val s1 = StreamingNearDup.dedupBatch(corpus, hist, 1, threshold = 0.7,
      numHashes = 16, bands = 4, historyBuckets = 64)
    assert(s1.admitted == 30)
    val bucketDirs = new java.io.File(s"$hist/bands").listFiles()
      .filter(_.getName.startsWith("__bucket=")).map(_.getName).toSet
    assert(bucketDirs.size > 4, s"need bucket spread, got $bucketDirs")

    // the probe for a 1-doc batch: its 4 band keys hash to ≤4 buckets
    val batch = Seq(doc(100, (1 to 40).map(j => s"nw$j"))).toDF("doc_id", "text")
    val keys = NearDup.bandKeyRows(
      NearDup.hashedShingles(batch, "doc_id", "text", 3), 16, 4)
    val touched = keys.select(IdempotentAppend.bucketExpr(
        Seq(col("band"), col("key")), 64).as("b"))
      .distinct().as[Long].collect().toSet
    assert(touched.size <= 4)
    // the same filtered read dedupBatch issues — execution-time file list
    val readFiles = spark.read.parquet(s"$hist/bands")
      .filter(col(IdempotentAppend.BucketCol).isin(touched.toSeq: _*))
      .select(input_file_name().as("f")).distinct().as[String].collect()
    assert(readFiles.nonEmpty)
    val readDirs = readFiles.map(f =>
      f.split("/").find(_.startsWith("__bucket=")).get).toSet
    assert(readDirs.subsetOf(touched.map(b => s"__bucket=$b")),
      s"probe read outside its buckets: $readDirs vs $touched")
    assert(readDirs.size < bucketDirs.size,
      "probe must prune: read every bucket dir of the history")

    // and the pruned kernel still classifies correctly: a history
    // near-dup is dropped, the new doc admits
    val b2 = Seq(doc(101, (1 to 40).map(j => s"c5w$j").updated(7, "EDIT")),
      doc(102, (1 to 40).map(j => s"q$j"))).toDF("doc_id", "text")
    val s2 = StreamingNearDup.dedupBatch(b2, hist, 2, threshold = 0.7,
      numHashes = 16, bands = 4, historyBuckets = 64)
    assert(s2.dupOfHistory == 1 && s2.admitted == 1, s2.toString)
  }

  test("crash self-heal: bands lost after shingle append -> replay re-admits, store converges") {
    // the scaladoc's crash-ordering argument, executed: shingles are
    // written BEFORE bands, so the worst crash leaves admitted docs with
    // shingles but no band rows. Simulate it by deleting the bands dir.
    val hist = tmpDir("snd_crash")
    val b1 = Seq(doc(1, base), doc(2, (1 to 40).map(i => s"x$i")))
      .toDF("doc_id", "text")
    val s1 = StreamingNearDup.dedupBatch(b1, hist, 1, threshold = 0.7)
    assert(s1.admitted == 2)
    // crash between the appends: band rows never landed
    val bandsPath = new org.apache.hadoop.fs.Path(s"$hist/bands")
    val fs = bandsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(bandsPath, true)

    // replay: docs are invisible to the band probe (no self-collision),
    // re-admit; shingle re-insert is a 0-row idempotent append and the
    // bands catch up — admitted reports the SHINGLE-insert truth (0)
    val s2 = StreamingNearDup.dedupBatch(b1, hist, 1, threshold = 0.7)
    assert(s2.dupOfHistory == 0 && s2.admitted == 0, s2.toString)
    val ids = spark.read.parquet(s"$hist/shingles")
      .select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L), s"shingle store diverged: $ids")

    // store is fully healed: doc 1 self-collides as a history dup; the
    // near-dup doc 3 is blocked too (keeper doc 1 sits in THIS batch, so
    // it classifies as in-batch dup); nothing admits
    val b2 = Seq(doc(1, base), doc(3, base.updated(3, "EDITED")))
      .toDF("doc_id", "text")
    val s3 = StreamingNearDup.dedupBatch(b2, hist, 2, threshold = 0.7)
    assert(s3.dupOfHistory == 1 && s3.dupInBatch == 1 && s3.admitted == 0,
      s3.toString)
  }

  test("e2e restart: file stream + real checkpoint, crash between appends, converges to the batch path") {
    // VERDICT r5 #6: the exactly-once/self-heal claims driven end to end
    // — a REAL file-source stream with a durable checkpoint dir, stopped
    // and restarted between micro-batches, with the worst-case crash
    // (shingles appended, bands lost) injected at the restart boundary.
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val hist = tmpDir("snd_e2e_hist")
    val input = tmpDir("snd_e2e_in")
    val ckpt = tmpDir("snd_e2e_ckpt")
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val stats = new java.util.concurrent.ConcurrentLinkedQueue[
      StreamingNearDup.BatchStats]()
    def startStream() = StreamingNearDup.dedupSink(
        spark.readStream.schema(schema).parquet(input), hist,
        threshold = 0.7, onBatch = stats.add(_))
      .option("checkpointLocation", ckpt)
      .start()

    // batch 0: two unrelated docs admit
    Seq(doc(1, base), doc(2, (1 to 40).map(i => s"x$i")))
      .toDF("doc_id", "text").write.mode("append").parquet(input)
    val q1 = startStream()
    try q1.processAllAvailable() finally q1.stop()

    // crash MID-foreachBatch: the shingle append landed, the bands append
    // and the checkpoint commit did not — delete the bands dir AND batch
    // 0's commit marker, exactly the on-disk state a kill between
    // StreamingNearDup's two appends leaves behind (foreachBatch commits
    // the marker only after the function returns)
    val bandsPath = new org.apache.hadoop.fs.Path(s"$hist/bands")
    val fs = bandsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(bandsPath, true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$ckpt/commits/0"), false)

    // restart from the same checkpoint: Spark REPLAYS batch 0 (docs 1, 2
    // self-heal their band rows via 0-row shingle re-inserts), then runs
    // batch 1 — a near-dup of doc 1 (blocked by the healed history) and
    // a genuinely new doc
    Seq(doc(3, base.updated(4, "EDITED")),
        doc(4, (1 to 40).map(i => s"z$i")))
      .toDF("doc_id", "text").write.mode("append").parquet(input)
    val q2 = startStream()
    try q2.processAllAvailable() finally q2.stop()

    val byBatch = stats.toArray(Array.empty[StreamingNearDup.BatchStats])
      .sortBy(s => (s.batchId, s.in))
    assert(byBatch.map(_.batchId).toSeq == Seq(0L, 0L, 1L),
      s"uncommitted batch must replay once, committed never: $byBatch")
    assert(byBatch(0).admitted == 2, byBatch(0).toString)
    // the replay: same 2 docs, 0 NEW inserts (exactly-once), bands healed
    assert(byBatch(1).in == 2 && byBatch(1).admitted == 0,
      byBatch(1).toString)
    // batch 1: doc 3 blocked by the HEALED history, doc 4 admitted
    assert(byBatch(2).dupOfHistory == 1 && byBatch(2).admitted == 1,
      byBatch(2).toString)

    // the healed store equals a fresh BATCH-path run over the same docs
    val histRef = tmpDir("snd_e2e_ref")
    StreamingNearDup.dedupBatch(Seq(doc(1, base),
        doc(2, (1 to 40).map(i => s"x$i"))).toDF("doc_id", "text"),
      histRef, 0, threshold = 0.7)
    StreamingNearDup.dedupBatch(Seq(doc(3, base.updated(4, "EDITED")),
        doc(4, (1 to 40).map(i => s"z$i"))).toDF("doc_id", "text"),
      histRef, 1, threshold = 0.7)
    def ids(h: String, sub: String) = spark.read.parquet(s"$h/$sub")
      .select(col("id")).distinct().as[Long].collect().toSet
    assert(ids(hist, "shingles") === ids(histRef, "shingles"))
    assert(ids(hist, "bands") === ids(histRef, "bands"),
      "band store must heal to the batch-path state after the crash")

    // and the healed history blocks future near-dups of the crashed docs
    val s3 = StreamingNearDup.dedupBatch(
      Seq(doc(5, base.updated(9, "TWEAKED"))).toDF("doc_id", "text"),
      hist, 2, threshold = 0.7)
    assert(s3.dupOfHistory == 1 && s3.admitted == 0, s3.toString)
  }

  test("streaming: micro-batches flow through the same kernel with stats") {
    val hist = tmpDir("snd_stream")
    val stats = new java.util.concurrent.ConcurrentLinkedQueue[
      StreamingNearDup.BatchStats]()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = StreamingNearDup.dedupSink(docs, hist, threshold = 0.7,
        onBatch = stats.add(_))
      .start()
    try {
      input.addData(doc(1, base), doc(2, base.updated(10, "EDITED")))
      q.processAllAvailable()
      input.addData(doc(3, base.updated(30, "TWEAKED")),
        doc(4, (1 to 40).map(i => s"y$i")))
      q.processAllAvailable()
    } finally q.stop()
    val byBatch = stats.toArray(Array.empty[StreamingNearDup.BatchStats])
      .sortBy(_.batchId)
    assert(byBatch.length == 2)
    // batch 0: 1 admitted (keeper), 2 dropped in-batch
    assert(byBatch(0).in == 2 && byBatch(0).dupInBatch == 1
      && byBatch(0).admitted == 1, byBatch(0).toString)
    // batch 1: 3 ≈ history keeper 1 → dropped; 4 admitted
    assert(byBatch(1).dupOfHistory == 1 && byBatch(1).admitted == 1,
      byBatch(1).toString)
  }
}
