package graft

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic main (kept for perf triage) — not part of the API.
  * Times one named query from SparkEntry at SPARK_GRAFT_SF_DIR, twice. */
object Probe {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args.headOption.getOrElse("q_a1_count")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = SparkEntry.queries(name)
    time(s"$name run 1")(System.err.println("rows=" + q(spark, sfDir).count()))
    time(s"$name run 2")(System.err.println("rows=" + q(spark, sfDir).count()))
    q(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
