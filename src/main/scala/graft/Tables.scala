package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the test tables (TESTDATA.md). One parquet dataset per table;
  * at production scale the same layout holds — Catalyst prunes columns and
  * pushes predicates into the parquet scan, and a partitioned dataset
  * (e.g. by ingest date) adds partition pruning with no code change here. */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Session-keyed scratch path for battery queries that must stage data
    * under `java.io.tmpdir` (format round-trips, pushdown-staged tables,
    * sinks). `java.io.tmpdir` is per-MACHINE, not per-JVM (VERDICT r9 #1):
    * a fixed well-known path lets two concurrent sessions — e.g. an
    * `sbt test` run racing a `graft.Verify` run — overwrite each other's
    * `_temporary` commit dirs and crash both. Keying by (corpus-dir hash,
    * applicationId) gives every (session, scale-factor) pair its own dir
    * while a repeat-run bench inside ONE session still overwrites in
    * place instead of leaking a copy per invocation (ADVICE r3).
    * `StagingPathSpec` enforces this class-wide: every tmpdir write in
    * the battery must route through here or carry a per-run UUID. */
  def stagedPath(spark: SparkSession, dir: String, tag: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_${tag}_" +
      s"${dir.hashCode.toHexString}_${spark.sparkContext.applicationId}"

  /** Epoch-micros view of an event-time column, robust to the physical type
    * the data generator emits — the generator has shipped BOTH over the
    * project's life:
    *  - parquet `timestamp[ns]` read as INT64 nano longs (under the
    *    `nanosAsLong` legacy flag the entrypoints set): integral `DIV 1000`
    *    truncates to micros, exactly DuckDB's nanos→TIMESTAMP truncation;
    *  - parquet `timestamp[us]` read as TIMESTAMP_NTZ (or TIMESTAMP):
    *    `unix_micros` under the repo-wide UTC session reproduces DuckDB's
    *    `epoch_us(ts)` on the same naive value.
    * Both paths are plain Catalyst expressions — codegen'd, pushdown-safe,
    * and in exact value parity with the oracle's `epoch_us(ts)`. */
  def epochMicros(df: DataFrame, name: String): Column =
    df.schema(name).dataType match {
      case LongType         => expr(s"$name DIV 1000")
      case TimestampNTZType => unix_micros(col(name).cast(TimestampType))
      case TimestampType    => unix_micros(col(name))
      case dt => throw new IllegalArgumentException(
        s"epochMicros: unsupported event-time type $dt for column $name")
    }
}
