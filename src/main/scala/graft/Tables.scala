package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the test tables (TESTDATA.md). One parquet dataset per table;
  * at production scale the same layout holds — Catalyst prunes columns and
  * pushes predicates into the parquet scan, and a partitioned dataset
  * (e.g. by ingest date) adds partition pruning with no code change here. */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
