package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Co-located (bucketed) table layout — the storage-side answer to the
  * engine's biggest scale cost, the join/agg shuffle. A table written
  * with Spark's catalog bucketing (`bucketBy(n, key)`) carries its hash
  * distribution as METADATA: any subsequent equi-join or aggregation on
  * the bucket key satisfies the required clustering outright, so the
  * exchange disappears from the plan (pinned in BucketedSpec — zero
  * `Exchange` operators joining two co-bucketed tables, and one-sided
  * shuffle against an unbucketed probe side).
  *
  * At 100 TB this is the difference between re-shuffling a fact table on
  * every run of a recurring join pipeline and paying the shuffle ONCE at
  * layout time: dimension-enrichment joins, the L38 as-of family's key
  * shuffle, L20 sessionization and the L34 caps all cluster by the same
  * entity key, so one bucketed materialization feeds them all. The
  * per-bucket file count stays 1 when the writer pre-repartitions by the
  * bucket key (done here) — which also keeps `sortBy` usable by the
  * reader (Spark only trusts the sort order of single-file buckets).
  *
  * This complements [[IdempotentAppend]]'s DIRECTORY bucketing, which
  * solves a different problem (partition-PRUNED idempotence probes —
  * pruning needs directories; exchange elimination needs catalog bucket
  * metadata). The two layouts compose: a directory-partitioned,
  * catalog-bucketed sink prunes on the partition column and joins
  * shuffle-free on the bucket key.
  *
  * Uses only the public DataFrameWriter bucketing API over the session
  * catalog — works on the in-memory catalog (tests) and any metastore.
  */
object Bucketed {

  /** Materialize `df` as a parquet-backed catalog table bucketed (and
    * sorted) by `keys` into `numBuckets` hash buckets, one file per
    * bucket. `table` may be database-qualified. */
  def materialize(df: DataFrame, table: String, keys: Seq[String],
      numBuckets: Int, overwrite: Boolean = true): Unit = {
    require(keys.nonEmpty, "bucket keys must be non-empty")
    require(numBuckets > 0, s"numBuckets $numBuckets must be positive")
    import org.apache.spark.sql.functions.col
    df.repartition(numBuckets, keys.map(col): _*)
      .write
      .format("parquet")
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata rides the catalog — the
    * returned frame's joins/aggs on the bucket keys need no exchange). */
  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
