package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.BlocklistScan

/** Streaming twin of the batch blocklist scan
  * ([[graft.operators.BlocklistScan]], L128) — continuous policy-phrase
  * auditing over a live document stream (the established twin
  * discipline: StreamingTransitions, StreamingCdcDedup).
  *
  * Two surfaces:
  *
  *   - [[scan]]: per-document (docId, nHits, nPatterns), Append-mode and
  *     STATELESS — the Aho–Corasick automaton is built per trigger
  *     partition from the broadcast list (the batch operator's
  *     per-partition-init discipline carries over verbatim; the
  *     automaton itself is never serialized into state or shuffled) and
  *     each arriving document is scanned exactly once, so stream ≡
  *     batch holds row-for-row REGARDLESS of arrival order — a
  *     stateless map commutes with any micro-batch split. No watermark
  *     needed on this surface.
  *
  *   - [[windowedHits]]: event-time tumbling-window totals
  *     (window_start, n_docs, n_hits, n_flagged), watermark-FINAL: in
  *     Append mode a window emits once, after the watermark passes its
  *     end, so cross-batch disorder inside the watermark lands in the
  *     right window and rows later than the watermark are dropped by
  *     the engine before user code (the standard lateness contract —
  *     size `watermarkDelay` to the source's real disorder). Stream ≡
  *     batch window totals is spec-pinned under cross-batch disorder.
  *
  * Hit semantics are the batch operator's, shared through the SAME
  * automaton class and the SAME pattern validation
  * ([[BlocklistScan.validatePatterns]]): every (position, pattern)
  * occurrence counts, overlaps and shared suffixes included.
  * Event-time domain: `tsUs > 0` strictly (the r6 epoch contract shared
  * by every streaming operator here). */
object StreamingBlocklist {

  final case class Doc(docId: Long, tsUs: Long, text: String)
  final case class DocHits(docId: Long, tsUs: Long, nHits: Long,
    nPatterns: Long)

  /** Per-document scan of a streaming Dataset: one output row per
    * non-null input document, Append-mode, stateless. `tsUs` rides
    * through so [[windowedHits]] (and any event-time consumer) can
    * window the result. */
  def scan(docs: Dataset[Doc], patterns: Seq[String])
      (implicit spark: SparkSession): Dataset[DocHits] = {
    import spark.implicits._
    BlocklistScan.validatePatterns(patterns)
    val patB = spark.sparkContext.broadcast(patterns)
    docs
      .filter((d: Doc) => d.text != null)
      .mapPartitions { it =>
        // per-trigger-partition automaton build, the batch discipline
        val ac = new BlocklistScan.Automaton(patB.value)
        it.map { d =>
          val (hits, seen) = ac.scan(d.text)
          DocHits(d.docId, d.tsUs, hits, seen.cardinality().toLong)
        }
      }
  }

  /** Tumbling event-time window totals over the per-document scan:
    * (window_start, n_docs, n_hits, n_flagged) where n_flagged counts
    * documents with ≥ 1 hit. Watermark-final Append output — each
    * window emits exactly once. */
  def windowedHits(docs: Dataset[Doc], patterns: Seq[String],
      watermarkDelay: String, windowDuration: String)
      (implicit spark: SparkSession): DataFrame = {
    scan(docs, patterns)
      .withColumn("eventTime", timestamp_micros(col("tsUs")))
      .withWatermark("eventTime", watermarkDelay)
      .groupBy(window(col("eventTime"), windowDuration))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nHits")).as("n_hits"),
        sum((col("nPatterns") > 0L).cast("long")).as("n_flagged"))
      .select(col("window.start").as("window_start"),
        col("n_docs"), col("n_hits"), col("n_flagged"))
  }
}
