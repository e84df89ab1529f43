package graft.operators

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The reference's core sink contract (README.md:176-187): re-running the
  * same window inserts 0 — including the failure scenario that crashed the
  * reference 4 times (S8 UniqueViolation, BASELINE.md last row). */
class IdempotentAppendSpec extends SparkSpec {
  import spark.implicits._

  private def batch(ids: (Int, String)*) = ids.toSeq.toDF("id", "v")

  test("idempotence: write twice == write once (flat parquet)") {
    val sink = tmpDir("flat")
    val b = batch(1 -> "a", 2 -> "b", 3 -> "c")
    assert(IdempotentAppend.toParquet(b, sink, "id") == 3)
    assert(IdempotentAppend.toParquet(b, sink, "id") == 0) // re-run: 0
    assert(spark.read.parquet(sink).count() == 3)
  }

  test("overlapping batch inserts only the fresh keys") {
    val sink = tmpDir("overlap")
    IdempotentAppend.toParquet(batch(1 -> "a", 2 -> "b"), sink, "id")
    val n = IdempotentAppend.toParquet(batch(2 -> "B", 3 -> "c"), sink, "id")
    assert(n == 1)
    val rows = spark.read.parquet(sink).orderBy("id").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    assert(rows(1).getString(1) == "b") // first write wins, no overwrite
  }

  test("null keys filtered, in-batch duplicates deduped (F3+J1 front half)") {
    val sink = tmpDir("nulldup")
    val b = Seq((Some(1), "a"), (None, "x"), (Some(1), "a2"), (Some(2), "b"))
      .toDF("id", "v")
    assert(IdempotentAppend.toParquet(b, sink, "id") == 2)
  }

  test("empty input short-circuits without touching the sink (S7)") {
    val sink = tmpDir("empty")
    val empty = batch().filter(lit(false))
    assert(IdempotentAppend.toParquet(empty, sink, "id") == 0)
    assert(!new java.io.File(sink).exists())
  }

  test("bucketed sink: idempotent and probe reads only touched buckets") {
    val sink = tmpDir("bucketed")
    val big = (1 to 400).map(i => i -> s"v$i").toDF("id", "v")
    assert(IdempotentAppend.toBucketedParquet(big, sink, "id", numBuckets = 16) == 400)
    assert(IdempotentAppend.toBucketedParquet(big, sink, "id", numBuckets = 16) == 0)
    // a one-key batch probes only its own bucket's files
    val one = batch(7 -> "x")
    val probed = IdempotentAppend.probeFiles(one, sink, "id", numBuckets = 16)
    val all = spark.read.parquet(sink)
      .select(input_file_name()).distinct().count()
    assert(probed.nonEmpty && probed.length < all,
      s"probe read ${probed.length}/$all files — pruning not effective")
    assert(probed.forall(_.contains("__bucket=")),
      "probed files should come from bucket partition dirs")
    // and appending it stays idempotent across bucket layout
    assert(IdempotentAppend.toBucketedParquet(one, sink, "id", numBuckets = 16) == 0)
  }

  test("bucketed sink: custom bucketCols layout stays idempotent; needCount=false writes") {
    import spark.implicits._
    val sink = tmpDir("bucketcols")
    // dedup key is the composite __k, but the layout hashes (band, key) —
    // the StreamingNearDup band-store shape
    def b(ids: Range) = ids.flatMap(i => (0 until 4).map(bd =>
      (s"$i:$bd", i.toLong, bd, s"k$i$bd"))).toDF("__k", "id", "band", "key")
    assert(IdempotentAppend.toBucketedParquet(b(1 to 50), sink, "__k",
      numBuckets = 8, bucketCols = Seq("band", "key")) == 200)
    // replay: every row hashes to the same bucket, the probe finds it
    assert(IdempotentAppend.toBucketedParquet(b(1 to 50), sink, "__k",
      numBuckets = 8, bucketCols = Seq("band", "key")) == 0)
    // bucket assignment on disk matches the shared bucketExpr — a prober
    // using it prunes consistently with the writer
    val onDisk = spark.read.parquet(sink)
      .select(col(IdempotentAppend.BucketCol).cast("long").as("d"),
        IdempotentAppend.bucketExpr(Seq(col("band"), col("key")), 8).as("e"))
      .filter(col("d") =!= col("e")).count()
    assert(onDisk == 0, "disk bucket diverges from bucketExpr")
    // needCount=false: single write job, rows land, count unreported (-1)
    assert(IdempotentAppend.toBucketedParquet(b(51 to 60), sink, "__k",
      numBuckets = 8, bucketCols = Seq("band", "key"),
      needCount = false) == -1L)
    assert(spark.read.parquet(sink).count() == 240)
    // and the no-count append was itself probe-guarded: replaying it
    // appends nothing new
    IdempotentAppend.toBucketedParquet(b(51 to 60), sink, "__k",
      numBuckets = 8, bucketCols = Seq("band", "key"), needCount = false)
    assert(spark.read.parquet(sink).count() == 240)
  }

  test("window-partitioned bucketed sink: probe prunes to the batch's window") {
    import spark.implicits._
    val sink = tmpDir("windowed")
    def b(w: String, ids: Range) =
      ids.map(i => (i, s"v$i", w)).toDF("id", "v", "win")
    assert(IdempotentAppend.toBucketedParquet(
      b("2024-01", 1 to 100), sink, "id", 8, windowCol = Some("win")) == 100)
    assert(IdempotentAppend.toBucketedParquet(
      b("2024-02", 101 to 200), sink, "id", 8, windowCol = Some("win")) == 100)
    // re-run of window 1 inserts 0 and its probe touches only win=2024-01 dirs
    assert(IdempotentAppend.toBucketedParquet(
      b("2024-01", 1 to 100), sink, "id", 8, windowCol = Some("win")) == 0)
    val all = spark.read.parquet(sink)
    assert(all.count() == 200)
    // compaction: one file per touched (window, bucket) partition dir
    val files = all.select(input_file_name()).distinct().count()
    val dirs = all.select("win", IdempotentAppend.BucketCol).distinct().count()
    assert(files == dirs, s"$files files for $dirs partition dirs")
  }

  test("JDBC (Derby embedded): conflict-skipping insert is idempotent") {
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE sink_t (id INT PRIMARY KEY, v VARCHAR(20))")
    conn.close()
    val b = batch(1 -> "a", 2 -> "b", 3 -> "c")
    val n1 = IdempotentAppend.toJdbc(b, url, "sink_t", "id",
      dialect = IdempotentAppend.Derby)
    val n2 = IdempotentAppend.toJdbc(b, url, "sink_t", "id",
      dialect = IdempotentAppend.Derby)
    assert(n1 == 3, s"first run inserted $n1")
    assert(n2 == 0, s"re-run inserted $n2")
    val c2 = DriverManager.getConnection(url)
    val rs = c2.createStatement().executeQuery("SELECT COUNT(*) FROM sink_t")
    rs.next()
    assert(rs.getInt(1) == 3)
    c2.close()
  }

  test("JDBC read-probe (S5): spark.read.jdbc keys + anti-join append") {
    val url = "jdbc:derby:memory:graftprobe;create=true"
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE probe_t (id INT PRIMARY KEY, v VARCHAR(20))")
    conn.close()
    val b1 = batch(1 -> "a", 2 -> "b")
    assert(IdempotentAppend.toJdbcWithProbe(b1, url, "probe_t", "id",
      IdempotentAppend.Derby) == 2)
    // probe sees the existing keys; only key 3 is fresh
    val keys = IdempotentAppend.jdbcKeys(spark, url, "probe_t", "id")
    assert(keys.count() == 2)
    val b2 = batch(2 -> "B", 3 -> "c")
    assert(IdempotentAppend.toJdbcWithProbe(b2, url, "probe_t", "id",
      IdempotentAppend.Derby) == 1)
    // same protocol with a partitioned probe read
    val b3 = batch(3 -> "C", 4 -> "d")
    assert(IdempotentAppend.toJdbcWithProbe(b3, url, "probe_t", "id",
      IdempotentAppend.Derby, probePartitions = 2) == 1)
  }

  test("bucketed sink: batch that empties after the null-key filter inserts 0") {
    // ADVICE r2: `touched` was an empty array here and reduce() threw —
    // the protocol contract says null keys are filtered, not fatal.
    val sink = tmpDir("bucketed_empty")
    assert(IdempotentAppend.toBucketedParquet(batch(1 -> "a"), sink, "id", 8) == 1)
    val allNull = Seq((Option.empty[Int], "x"), (Option.empty[Int], "y"))
      .toDF("id", "v")
    assert(IdempotentAppend.toBucketedParquet(allNull, sink, "id", 8) == 0)
    assert(spark.read.parquet(sink).count() == 1)
  }

  test("jdbcKeys partitioned probe: >1 partition, identical anti-join result") {
    val url = "jdbc:derby:memory:graftpart;create=true"
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE part_t (id INT PRIMARY KEY, v VARCHAR(20))")
    conn.close()
    val existing = (1 to 20).map(i => i -> s"v$i")
    assert(IdempotentAppend.toJdbc(batch(existing: _*), url, "part_t", "id",
      IdempotentAppend.Derby) == 20)
    val k1 = IdempotentAppend.jdbcKeys(spark, url, "part_t", "id")
      .withColumnRenamed("ID", "id") // Derby upper-cases identifiers
    val k3 = IdempotentAppend.jdbcKeys(spark, url, "part_t", "id",
        numPartitions = 3)
      .withColumnRenamed("ID", "id")
    assert(k3.rdd.getNumPartitions > 1,
      s"partitioned probe read ${k3.rdd.getNumPartitions} partition(s)")
    assert(k1.count() == 20 && k3.count() == 20)
    val b = batch(19 -> "s", 20 -> "t", 21 -> "u", 22 -> "w")
    def fresh(keys: org.apache.spark.sql.DataFrame) =
      b.join(keys, Seq("id"), "left_anti")
        .select("id").as[Int].collect().toSet
    assert(fresh(k1) == Set(21, 22) && fresh(k3) == Set(21, 22))
  }

  test("jdbcKeys partitioned probe works on a DATE key (string bounds)") {
    val url = "jdbc:derby:memory:graftdate;create=true"
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE date_t (d DATE PRIMARY KEY, v VARCHAR(10))")
    val ps = conn.prepareStatement("INSERT INTO date_t VALUES (?, ?)")
    for (i <- 1 to 12) {
      ps.setDate(1, java.sql.Date.valueOf(f"2024-$i%02d-01"))
      ps.setString(2, s"m$i")
      ps.executeUpdate()
    }
    conn.close()
    val keys = IdempotentAppend.jdbcKeys(spark, url, "date_t", "d",
      numPartitions = 3)
    assert(keys.count() == 12)
    assert(keys.rdd.getNumPartitions > 1)
  }

  test("dialect SQL shape: the statements a production backend would run") {
    // The Postgres path never executes in this image (no driver jar) — pin
    // its statement text and bind order against a recorded expectation so
    // the one path a production user runs isn't the one never looked at.
    val (pg, pgTwice) = IdempotentAppend.Postgres.insertIgnore(
      "raw.qb_customers", Seq("id", "payload"), "id")
    assert(pg == "INSERT INTO raw.qb_customers (id,payload) VALUES (?,?) " +
      "ON CONFLICT (id) DO NOTHING")
    assert(!pgTwice, "Postgres binds each column exactly once")
    val (db, dbTwice) = IdempotentAppend.Derby.insertIgnore(
      "t", Seq("id", "v"), "id")
    assert(db == "INSERT INTO t (id,v) SELECT ?,? FROM SYSIBM.SYSDUMMY1 " +
      "WHERE NOT EXISTS (SELECT 1 FROM t t WHERE t.id = ?)")
    assert(dbTwice, "NOT EXISTS dialects bind the key a second time")
    val (an, anTwice) = IdempotentAppend.AnsiNotExists.insertIgnore(
      "t", Seq("id", "v"), "id")
    assert(an == "INSERT INTO t (id,v) SELECT ?,? FROM (VALUES (1)) v(x) " +
      "WHERE NOT EXISTS (SELECT 1 FROM t t WHERE t.id = ?)")
    assert(anTwice)
  }

  test("insertedFromBatch: real counts summed; SUCCESS_NO_INFO → probe delta") {
    // ADVICE r2: drivers with server-side batching (Postgres
    // reWriteBatchedInserts) return -2 per statement; the count must fall
    // back to pending - existingBefore instead of reporting 0.
    val NI = java.sql.Statement.SUCCESS_NO_INFO
    assert(IdempotentAppend.insertedFromBatch(Array(1, 0, 1), 3, 99) == 2)
    assert(IdempotentAppend.insertedFromBatch(Array(NI, NI, NI), 3, 1) == 2)
    assert(IdempotentAppend.insertedFromBatch(Array(NI, 1), 2, 2) == 0)
    assert(IdempotentAppend.insertedFromBatch(Array.empty[Int], 0, 0) == 0)
  }

  test("S8 divergence: concurrent-duplicate batch does NOT raise, inserts once") {
    // the reference's observed bug: same batch landing twice (fallback blind
    // append) crashed on UniqueViolation; ours converges to one copy.
    val sink = tmpDir("s8")
    val dup = batch(1 -> "a", 1 -> "a", 2 -> "b", 2 -> "b")
    assert(IdempotentAppend.toParquet(dup, sink, "id") == 2)
    assert(IdempotentAppend.toParquet(dup, sink, "id") == 0)
    assert(spark.read.parquet(sink).count() == 2)
  }
}
