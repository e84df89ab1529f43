package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic main (bench stall root-cause) — not part of the API. */
object Probe {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    time("range count")(spark.range(10).count())
    val c = time("read customer")(spark.read.parquet(s"$sfDir/customer.parquet"))
    time("plain groupBy count")(
      c.groupBy(col("c_mktsegment")).count().collect())
    time("lower() select only")(
      c.select(lower(col("c_mktsegment"))).collect())
    time("q_x2 run 1")(
      c.groupBy(lower(col("c_mktsegment")).as("seg"))
        .agg(count(lit(1)).as("n")).orderBy(col("seg")).collect())
    time("q_x2 run 2")(
      c.groupBy(lower(col("c_mktsegment")).as("seg"))
        .agg(count(lit(1)).as("n")).orderBy(col("seg")).collect())
    time("orderBy only")(
      c.groupBy(col("c_mktsegment")).count().orderBy(col("c_mktsegment")).collect())
    spark.stop()
  }
}
