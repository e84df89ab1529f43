package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

import graft.operators.{IdempotentAppend, NearDup}

/** Streaming near-duplicate filtering — the continuous form of the L2
  * MinHash pipeline, and the operation a crawl-ingest pipeline actually
  * runs: admit each incoming document only if it is not a near-duplicate
  * of anything ALREADY ADMITTED (earlier in this batch or in any earlier
  * batch).
  *
  * State design: the dedup history lives in parquet tables (admitted
  * band keys + admitted shingle sets), NOT in the streaming state store —
  * at 100 TB of accumulated corpus the state store cannot hold shingle
  * sets, while a parquet history is restart-safe, shared across queries,
  * and joins as an ordinary (prunable, AQE-planned) table. The per-batch
  * kernel is the same signature → band-bucket → exact-confirm shape as
  * the batch operator (NearDup.minhashPairs); the history append goes
  * through the J3 idempotent protocol, so a REPLAYED micro-batch admits 0
  * new documents — exactly-once without sink transactions.
  *
  * Scale notes: the candidate test is a band-key equi-join against the
  * history — never all-pairs — and the exact confirm runs only on
  * colliding (new, old) pairs. The history band table should graduate to
  * [[IdempotentAppend.toBucketedParquet]]'s key-hash bucket layout once
  * it outgrows its batches, making the probe prune to the batch's
  * buckets; the shingle store is only read for ids that collide.
  *
  * Dedup semantics (conservative family drop, standard for training-data
  * dedup): within a batch the smallest id of a confirmed near-dup family
  * is the keeper; any doc confirmed against a smaller-id batch doc OR any
  * history doc is dropped — even if that smaller doc is itself dropped,
  * its family is represented in the corpus by its own keeper. */
object StreamingNearDup {

  final case class BatchStats(batchId: Long, in: Long, dupOfHistory: Long,
    dupInBatch: Long, admitted: Long)

  private def bandsDir(h: String) = s"$h/bands"
  private def shinglesDir(h: String) = s"$h/shingles"

  // Stage timing to stderr when SPARK_GRAFT_TRACE is set — dedupBatch is
  // a multi-action protocol, so wall-time questions need per-stage answers.
  private val trace = sys.env.contains("SPARK_GRAFT_TRACE")
  private def timed[T](label: String)(body: => T): T =
    if (!trace) body
    else {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[dedupBatch] $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

  /** Run one batch through the history-aware near-dup filter: returns
    * stats and appends the ADMITTED docs' band keys + shingle sets to the
    * history. Also the batch-backfill entry point (a backfill is just a
    * big batch). `admitted` counts NEWLY inserted docs, so a replayed
    * batch reports admitted=0. */
  def dedupBatch(batch: DataFrame, historyDir: String, batchId: Long = -1L,
      idCol: String = "doc_id", textCol: String = "text",
      threshold: Double = 0.8, shingleLen: Int = 3,
      numHashes: Int = 128, bands: Int = 32,
      maxBucketSize: Int = 10000): BatchStats = {
    val spark = batch.sparkSession
    val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def cache(df: DataFrame): DataFrame = { cached += df; df.persist() }
    var checkpointed: Option[DataFrame] = None
    try {
      val sh = cache(NearDup.hashedShingles(batch, idCol, textCol, shingleLen))
      timed("shingle+cache")(sh.count()) // fill the shared cache before branches race on it
      // same banding derivation as the batch operator — shared helper, so
      // the streaming path cannot drift from NearDup.minhashCandidates
      val keys = cache(NearDup.bandKeyRows(sh, numHashes, bands))

      val fs = new Path(historyDir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      // Writes go shingles-FIRST, bands second (see below), so the two
      // existence flags can disagree after a crash between the appends;
      // each read guards on its own path and every partial state
      // self-heals on replay (bands-less admitted docs simply re-admit:
      // shingle re-insert is a 0-row idempotent append, bands catch up).
      val hasBands = fs.exists(new Path(bandsDir(historyDir)))
      val hasShingles = fs.exists(new Path(shinglesDir(historyDir)))

      // candidate pairs: in-batch (id_a < id_b — smallest id keeps) plus
      // batch-vs-history band collisions (history id on the "a" side so
      // the confirm marks the NEW doc as the duplicate)
      val inBatch = NearDup.bucketPairs(keys, maxBucketSize)
      val vsHistory =
        if (!hasBands) inBatch.limit(0)
        else {
          // hot-bucket cap on BOTH sides of the band-key join (the
          // in-batch path drops over-cap buckets entirely; its analog
          // here bounds the H×B product): a band key that accumulated a
          // mass-duplicate family in the history — or arrives as one in
          // a backfill batch — must not re-open the quadratic join.
          // Shape: groupBy-count the bucket sizes (map-side partials; the
          // over-cap set is near-empty by construction) and anti-join —
          // the capped table itself is never shuffled, unlike the
          // count-over-window form this replaced (which shuffled and
          // sorted every band row just to annotate bucket sizes)
          def capped(d: DataFrame): DataFrame = {
            val hot = d.groupBy(col("band"), col("key")).count()
              .filter(col("count") > maxBucketSize)
              .select(col("band"), col("key"))
            d.join(hot, Seq("band", "key"), "left_anti")
          }
          val batchKeys = capped(keys).withColumnRenamed("id", "id_b")
          val relevant = spark.read.parquet(bandsDir(historyDir))
            .select(col("id").as("id_a"), col("band"), col("key"))
            .join(batchKeys.select(col("band"), col("key")).distinct(),
              Seq("band", "key"), "left_semi")
          capped(relevant)
            .join(batchKeys, Seq("band", "key"))
            .select(col("id_a"), col("id_b")).distinct()
        }
      val cand = cache(inBatch.unionAll(vsHistory).distinct())

      // exact confirm needs both sides' shingle sets: batch ∪ history
      // (history shingles join in only for ids that actually collide).
      // The confirmed pair set is localCheckpoint'ed — NOT merely cached —
      // because this batch later APPENDS to the history paths the cand /
      // confirm plans read, and Spark's CacheManager.recacheByPath would
      // invalidate and recompute those caches against the batch's OWN
      // writes (every admitted doc then "collides" with itself, admitting
      // 0). Checkpointing cuts the path lineage; the pair set is tiny.
      val allSh =
        if (!hasShingles) sh
        else sh.unionAll(spark.read.parquet(shinglesDir(historyDir)))
      val confirmed = timed("confirm+checkpoint")(
        NearDup.confirmJaccard(cand, allSh, threshold).localCheckpoint())
      checkpointed = Some(confirmed)

      val batchIds = sh.select(col("id"))
      val batchIdsA = batchIds.withColumnRenamed("id", "id_a")
      // history-dup: the keeper (id_a) is a history doc — including the
      // REPLAY case where the batch doc's own id is already admitted and
      // collides with itself (id_a == id_b)
      val dupVsHistory = cache(
        confirmed.filter(col("id_a") === col("id_b"))
          .select(col("id_b").as("id"))
          .unionAll(
            confirmed.join(batchIdsA, Seq("id_a"), "left_anti")
              .select(col("id_b").as("id")))
          .distinct())
      val dupInBatch = cache(
        confirmed.filter(col("id_a") =!= col("id_b"))
          .join(batchIdsA, Seq("id_a"), "left_semi") // keeper ∈ batch
          .select(col("id_b").as("id")).distinct()
          .join(dupVsHistory, Seq("id"), "left_anti"))

      // cached: both appends below re-derive their input from this set
      // across several actions each (count, write)
      val admittedIds = cache(batchIds
        .join(dupVsHistory, Seq("id"), "left_anti")
        .join(dupInBatch, Seq("id"), "left_anti"))

      // counts FIRST: |admitted| = in − dupHist − dupBatch (the three
      // sets partition the batch), so the appends below can skip their
      // per-sink empty-probe jobs — and be skipped entirely on a replay
      // that admits nothing. At toy scale this protocol is action-count
      // bound; every saved job is real wall time. If a batch carries
      // duplicate ids, nIn over-counts and nAdmitted only OVER-estimates
      // (nIn ≥ distinct ≥ dupHist + dupBatch + |admitted|), so the skip
      // stays conservative: nAdmitted == 0 still implies admitted = ∅.
      val (nIn, nDupHist, nDupBatch) = timed("stats counts")(
        (batchIds.count(), dupVsHistory.count(), dupInBatch.count()))
      val nAdmitted = nIn - nDupHist - nDupBatch

      // idempotent history append (J3): a replayed batch re-derives the
      // same ids, which already exist → inserts 0. SHINGLES are written
      // BEFORE bands: a crash between the two appends then leaves docs
      // that are invisible to the band probe but fully re-admittable on
      // replay (0-row shingle re-insert + bands catch-up). The reverse
      // order would strand band rows whose shingle sets never arrive —
      // such a doc self-collides on replay, is classified history-dup,
      // and its shingles would NEVER be backfilled, silently admitting
      // every future near-duplicate of it.
      val inserted = if (nAdmitted == 0L) 0L else {
        val admittedSh = sh.join(admittedIds, Seq("id"), "left_semi")
        val ins = timed("append shingles")(IdempotentAppend.toParquet(
          admittedSh, shinglesDir(historyDir), "id", assumeNonEmpty = true))
        // band rows are keyed by (id, band) — unique per admitted doc per band
        val admittedKeys = keys.join(admittedIds, Seq("id"), "left_semi")
          .select(concat(col("id"), lit(":"), col("band")).as("__k"),
            col("id"), col("band"), col("key"))
        timed("append bands")(IdempotentAppend.toParquet(
          admittedKeys, bandsDir(historyDir), "__k", assumeNonEmpty = true))
        ins
      }

      BatchStats(batchId, nIn, nDupHist, nDupBatch, inserted)
    } finally {
      cached.foreach(_.unpersist(blocking = false))
      // a long-running dedupSink stream otherwise accumulates one
      // checkpoint per micro-batch (see Checkpoints' scaladoc)
      checkpointed.foreach(graft.operators.Checkpoints.release)
    }
  }

  /** Streaming writer: every micro-batch flows through [[dedupBatch]];
    * per-batch stats surface through `onBatch` (metrics hook). */
  def dedupSink(docs: DataFrame, historyDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      threshold: Double = 0.8, shingleLen: Int = 3,
      numHashes: Int = 128, bands: Int = 32,
      maxBucketSize: Int = 10000,
      onBatch: BatchStats => Unit = _ => ()): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onBatch(dedupBatch(batch, historyDir, batchId, idCol, textCol,
          threshold, shingleLen, numHashes, bands, maxBucketSize))
        ()
      }
}
