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
    if (name == "io_micro") { // scratch: flat vs partitioned append cost
      import org.apache.spark.sql.functions._
      val df = spark.range(8000).select(col("id"),
        (col("id") % 32).as("band"), xxhash64(col("id")).as("key"))
      df.count() // warm
      val uid = java.util.UUID.randomUUID().toString.take(8)
      val flat = s"/tmp/probe_flat_$uid"
      val part = s"/tmp/probe_part_$uid"
      val withB = df.withColumn("__bucket",
        pmod(xxhash64(col("band"), col("key")), lit(16)))
      for (r <- 1 to 3) {
        time(s"flat write $r")(df.write.mode("append").parquet(flat))
        time(s"flat read count $r")(spark.read.parquet(flat).count())
        time(s"part write $r")(withB.repartition(col("__bucket"))
          .write.mode("append").partitionBy("__bucket").parquet(part))
        time(s"part read count $r")(spark.read.parquet(part).count())
        time(s"part pruned read $r")(spark.read.parquet(part)
          .filter(col("__bucket").isin(0L, 1L, 2L, 3L)).count())
      }
      spark.stop()
      return
    }
    if (name == "d6_jobs") { // scratch: job census for the q_d6 protocol
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      val jobTime = new java.util.concurrent.atomic.AtomicLong
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            starts.put(j.jobId, System.nanoTime())
          override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            jobs.incrementAndGet()
            val t0 = starts.remove(j.jobId)
            val ms = (System.nanoTime() - t0) / 1e6
            System.err.println(f"[probe] job ${j.jobId}%3d ${ms}%8.1f ms")
            jobTime.addAndGet(ms.toLong)
          }
        })
      val q = SparkEntry.queries("q_d6_delta_neardup")
      time("q_d6 run 1")(System.err.println("rows=" + q(spark, sfDir).count()))
      System.err.println(s"[probe] jobs=${jobs.get()} jobMs=${jobTime.get()}")
      jobs.set(0); jobTime.set(0)
      time("q_d6 run 2")(System.err.println("rows=" + q(spark, sfDir).count()))
      System.err.println(s"[probe] jobs=${jobs.get()} jobMs=${jobTime.get()}")
      spark.stop()
      return
    }
    val q = SparkEntry.queries(name)
    time(s"$name run 1")(System.err.println("rows=" + q(spark, sfDir).count()))
    time(s"$name run 2")(System.err.println("rows=" + q(spark, sfDir).count()))
    q(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
