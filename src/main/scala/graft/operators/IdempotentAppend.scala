package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J2/J3: the idempotent-append protocol — the reference's core sink
  * semantics (save_to_raw_customers_py.py:46-61; contract README.md:176-187):
  * re-running the same extraction window must insert 0 new rows.
  *
  * Protocol: null-filter (F3) → dedup batch (J1) → anti-join against the
  * sink's existing keys (J2) → append only the fresh rows.
  *
  * Scale note: the reference probes with a `WHERE id IN (…literal list…)`
  * SQL round-trip, which dies at ~100k keys. Here the probe is a distributed
  * left-anti join of the batch against the sink's key column only (column
  * pruning keeps the probe scan narrow); AQE turns it into a broadcast join
  * whenever either side is small. The reference's fallback blind append on
  * error (save_to_raw_customers_py.py:63-65) is a real observed bug
  * (UniqueViolation crashes, SURVEY.md §2 S8) and is deliberately NOT
  * replicated — failures propagate instead of corrupting the sink.
  */
object IdempotentAppend {

  /** Append `batch` to the parquet dataset at `sinkPath`, inserting only rows
    * whose `key` is not already present. Returns the number of rows inserted.
    */
  def toParquet(batch: DataFrame, sinkPath: String, key: String): Long = {
    val spark = batch.sparkSession
    val deduped = Dedup.byKey(WindowFilters.dropNullKeys(batch, key), key)

    val fs = new Path(sinkPath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val fresh =
      if (fs.exists(new Path(sinkPath))) {
        val existingKeys = spark.read.parquet(sinkPath).select(col(key))
        deduped.join(existingKeys, Seq(key), "left_anti")
      } else deduped

    fresh.persist()
    try {
      val n = fresh.count()
      if (n > 0) fresh.write.mode("append").parquet(sinkPath)
      n
    } finally fresh.unpersist()
  }
}
