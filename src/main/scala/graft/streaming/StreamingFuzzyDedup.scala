package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

import graft.operators.{FuzzyJoin, IdempotentAppend}

/** Continuous fuzzy-key admission — the streaming twin of L69's entity
  * matching, mirroring [[StreamingNearDup]]'s shape one level up: a
  * stream of keyed records (new vendors, new account names) is admitted
  * into a parquet master table only if its key string is NOT within
  * Levenshtein distance `maxDist` of an already-admitted key or of a
  * smaller-id key in the same micro-batch (the conservative family-drop
  * rule the d6 delta protocol uses — deterministic under any batch
  * split).
  *
  * Exactly-once: the append rides [[IdempotentAppend.toParquet]], so a
  * replayed micro-batch re-derives the same admitted set against the
  * same master prefix and inserts 0 — the J3 contract applied to ER.
  *
  * Scale shape: both screens are the deletion-neighborhood machinery
  * (lossless for ≤ maxDist, variant hashes only through the shuffle);
  * the master side is re-read per batch as a plain parquet scan —
  * at master sizes where that scan dominates, the variant table itself
  * would be persisted as a bucketed store exactly like
  * [[StreamingNearDup]]'s band store (documented trade; the batch-side
  * algebra is identical either way). */
object StreamingFuzzyDedup {

  /** The per-batch step, exposed for replay testing: admit `batch` rows
    * whose key survives both screens, append them idempotently, return
    * the number of rows actually inserted. */
  private[streaming] def admitBatch(batch: DataFrame, masterPath: String,
      idCol: String, strCol: String, maxDist: Int): Long = {
    val spark = batch.sparkSession
    val fs = new Path(masterPath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val keyed = batch.filter(col(idCol).isNotNull && col(strCol).isNotNull)
      .select(col(idCol).cast("long").as(idCol), col(strCol))
    val blockedByMaster =
      if (!fs.exists(new Path(masterPath))) keyed.limit(0).select(col(idCol))
      else {
        val master = spark.read.parquet(masterPath)
        FuzzyJoin.pairs(keyed, idCol, strCol, master, idCol, strCol, maxDist)
          .select(col("left_id").as(idCol)).distinct()
      }
    // intra-batch: a smaller-id fuzzy partner blocks, admitted or not
    // (conservative family drop — order-free, replay-deterministic)
    val blockedInBatch = FuzzyJoin.selfPairs(keyed, idCol, strCol, maxDist)
      .select(col("id_b").as(idCol)).distinct()
    val admitted = keyed
      .join(blockedByMaster.unionAll(blockedInBatch).distinct(),
        Seq(idCol), "left_anti")
    IdempotentAppend.toParquet(admitted, masterPath, idCol)
  }

  /** foreachBatch writer folding the stream into `masterPath`. */
  def admitStream(stream: DataFrame, masterPath: String, idCol: String,
      strCol: String, maxDist: Int = 1)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        admitBatch(batch, masterPath, idCol, strCol, maxDist)
        ()
      }
}
