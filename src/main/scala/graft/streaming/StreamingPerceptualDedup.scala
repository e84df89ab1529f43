package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

import graft.operators.{IdempotentAppend, Multimodal, NearDup}

/** Streaming PERCEPTUAL dedup — the continuous form of
  * [[Multimodal.perceptualNearDup]] (q_m6), and the multimodal sibling of
  * [[StreamingNearDup]]: admit each incoming blob only if its 32-bit
  * dHash is not within Hamming distance `maxHamming` of anything ALREADY
  * ADMITTED (earlier in this batch or in any earlier batch).
  *
  * Same state design as StreamingNearDup — history in parquet tables,
  * NOT the streaming state store — but the confirm state here is ONE
  * 8-byte hash per admitted doc (vs a MinHash pipeline's shingle sets),
  * so the whole protocol is lighter: `bands` (id, band, key) bucketed by
  * (band, key) for the candidate probe, `hashes` (id, ph) bucketed by id
  * for the Hamming confirm. Probe cost is O(history/buckets × touched
  * buckets), independent of total history size for micro-batches.
  *
  * Exactness carries over from the batch operator: 4×8-bit banding finds
  * every pair within Hamming ≤ 3 (pigeonhole), so for `maxHamming` ≤ 3
  * each batch's admit decision equals the exhaustive scan against
  * admitted history ∪ smaller-id batch docs. Dedup semantics are the
  * conservative family drop (StreamingNearDup's rule): a doc confirmed
  * against an admitted history doc OR any smaller-id batch doc is
  * dropped, even if that smaller doc is itself dropped. History appends
  * ride the J3 idempotent protocol — a replayed micro-batch admits 0 —
  * and write hashes FIRST, bands second, for the same crash-ordering
  * argument as StreamingNearDup (a bands-less admitted doc self-heals on
  * replay; a hash-less band row would silently admit every future
  * near-dup of it). */
object StreamingPerceptualDedup {

  final case class BatchStats(batchId: Long, in: Long, dupOfHistory: Long,
    dupInBatch: Long, admitted: Long)

  private def bandsDir(h: String) = s"$h/bands"
  private def hashesDir(h: String) = s"$h/hashes"

  /** Run one batch through the history-aware perceptual filter: returns
    * stats and appends the ADMITTED docs' hashes + band keys to the
    * history. Also the batch-backfill entry point. */
  def dedupBatch(batch: DataFrame, historyDir: String, batchId: Long = -1L,
      idCol: String = "doc_id", textCol: String = "text",
      maxHamming: Int = 3, maxBucketSize: Int = 10000,
      historyBuckets: Int = 16): BatchStats = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming $maxHamming breaks the 4-band exactness guarantee")
    val spark = batch.sparkSession
    val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def cache(df: DataFrame): DataFrame = { cached += df; df.persist() }
    var checkpointed: Option[DataFrame] = None
    try {
      // JIT'd hash kernel (the q_m6 scoring path); ids normalized to
      // LONG before bucketing derives from them (the StreamingNearDup
      // int-vs-long xxhash lesson)
      val h = cache(Multimodal.dHashKernel(
        batch.filter(col(idCol).isNotNull && col(textCol).isNotNull),
        idCol, textCol))
      val keys = cache(Multimodal.phashBands(h))

      val fs = new Path(historyDir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val hasBands = fs.exists(new Path(bandsDir(historyDir)))
      val hasHashes = fs.exists(new Path(hashesDir(historyDir)))

      val bandBucket =
        IdempotentAppend.bucketExpr(Seq(col("band"), col("key")),
          historyBuckets)
      if (!hasBands) keys.count() // fill both caches before branches race
      val cand = cache(
        (if (!hasBands) NearDup.bucketPairs(keys, maxBucketSize)
         else {
           // bucket-pruned band probe, then the shared side-tagged pair
           // expansion (in-batch pairs a<b; history ids on the "a" side,
           // including the replay self-pair id_a == id_b)
           val touched = keys.select(bandBucket.as("b")).distinct()
             .collect().map(_.getLong(0))
           val hist = spark.read.parquet(bandsDir(historyDir))
             .filter(col(IdempotentAppend.BucketCol).isin(touched: _*))
             .select(col("id"), col("band"), col("key"))
             .join(keys.select(col("band"), col("key")).distinct(),
               Seq("band", "key"), "left_semi")
           StreamingNearDup.taggedBucketPairs(hist, keys, maxBucketSize)
         }).distinct())

      // Hamming confirm needs both sides' hashes: batch ∪ the history
      // buckets of ids that actually collided. The touched-bucket collect
      // doubles as cand's materializing action.
      val allH =
        if (!hasHashes) h
        else {
          val idBucket =
            IdempotentAppend.bucketExpr(Seq(col("id_a")), historyBuckets)
          val touched = cand.select(idBucket.as("b")).distinct()
            .collect().map(_.getLong(0))
          if (touched.isEmpty) h
          else h.unionAll(
            spark.read.parquet(hashesDir(historyDir))
              .filter(col(IdempotentAppend.BucketCol).isin(touched: _*))
              .select(col("id"), col("ph")))
        }
      // localCheckpoint, not cache: this batch appends to the paths the
      // cand plan reads, and recacheByPath would recompute the caches
      // against the batch's own writes (the StreamingNearDup lesson)
      val confirmed = cand
        .join(allH.select(col("id").as("id_a"), col("ph").as("pha")),
          "id_a")
        .join(allH.select(col("id").as("id_b"), col("ph").as("phb")),
          "id_b")
        .filter(bit_count(col("pha").bitwiseXOR(col("phb")))
          <= maxHamming)
        .select(col("id_a"), col("id_b"))
        .localCheckpoint()
      checkpointed = Some(confirmed)

      val batchIds = h.select(col("id"))
      val batchIdsA = batchIds.withColumnRenamed("id", "id_a")
      val dupVsHistory = cache(
        confirmed.filter(col("id_a") === col("id_b"))
          .select(col("id_b").as("id"))
          .unionAll(
            confirmed.join(batchIdsA, Seq("id_a"), "left_anti")
              .select(col("id_b").as("id")))
          .distinct())
      val dupInBatch = cache(
        confirmed.filter(col("id_a") =!= col("id_b"))
          .join(batchIdsA, Seq("id_a"), "left_semi")
          .select(col("id_b").as("id")).distinct()
          .join(dupVsHistory, Seq("id"), "left_anti"))
      val admittedIds = cache(batchIds
        .join(dupVsHistory, Seq("id"), "left_anti")
        .join(dupInBatch, Seq("id"), "left_anti"))

      val statRows = batchIds.select(lit(0).as("s"))
        .unionAll(dupVsHistory.select(lit(1).as("s")))
        .unionAll(dupInBatch.select(lit(2).as("s")))
        .groupBy(col("s")).count().collect()
      def statOf(s: Int): Long = statRows
        .collectFirst { case r: Row if r.getInt(0) == s => r.getLong(1) }
        .getOrElse(0L)
      val (nIn, nDupHist, nDupBatch) = (statOf(0), statOf(1), statOf(2))
      val nAdmitted = nIn - nDupHist - nDupBatch

      val inserted = if (nAdmitted == 0L) 0L else {
        val admittedH = h.join(admittedIds, Seq("id"), "left_semi")
        val ins = IdempotentAppend.toBucketedParquet(
          admittedH, hashesDir(historyDir), "id",
          numBuckets = historyBuckets, assumeNonEmpty = true)
        val admittedKeys = keys.join(admittedIds, Seq("id"), "left_semi")
          .select(concat(col("id"), lit(":"), col("band")).as("__k"),
            col("id"), col("band"), col("key"))
        IdempotentAppend.toBucketedParquet(
          admittedKeys, bandsDir(historyDir), "__k",
          numBuckets = historyBuckets, bucketCols = Seq("band", "key"),
          assumeNonEmpty = true, needCount = false)
        ins
      }

      BatchStats(batchId, nIn, nDupHist, nDupBatch, inserted)
    } finally {
      cached.foreach(_.unpersist(blocking = false))
      checkpointed.foreach(graft.operators.Checkpoints.release)
    }
  }

  /** Streaming writer: every micro-batch flows through [[dedupBatch]]. */
  def dedupSink(docs: DataFrame, historyDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      maxHamming: Int = 3, maxBucketSize: Int = 10000,
      historyBuckets: Int = 16,
      onBatch: BatchStats => Unit = _ => ()): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onBatch(dedupBatch(batch, historyDir, batchId, idCol, textCol,
          maxHamming, maxBucketSize, historyBuckets))
        ()
      }
}
