package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in graft.queries.*; each map entry has a DuckDB-oracle twin
  * with identical column names, types and ORDER BY. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The composed training-data prep pipeline — every extension operator
    * family in one plan (scrub → dedup → near-dup prune → quality →
    * split → pack); q_j4_join_agg remains the reference-surface flagship
    * inside the battery. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_lp_training_prep")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 + the LLM-data
    * pipeline extension battery (BASELINE.json north star). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.LlmPipeline.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    * A `def` on purpose: LlmPipeline.dynamicOracles embeds state the
    * query runs establish (the q_t20 trained weight vector), so the dump
    * must happen AFTER Verify ran the queries — which Verify guarantees. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++ graft.queries.LlmPipeline.oracles ++
      graft.queries.LlmPipeline.dynamicOracles
}
