package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private val gap = java.time.Duration.ofSeconds(100) // 100_000_000 us

  // (user, us, event) — user 1: gaps 50s, 150s, exactly 100s;
  // user 2: a single event
  private def events = Seq(
    (1L, 0L, 10L),
    (1L, 50_000_000L, 11L),   // +50 s  -> same session
    (1L, 200_000_000L, 12L),  // +150 s -> NEW session
    (1L, 300_000_000L, 13L),  // +100 s exactly -> same session (strict >)
    (2L, 999L, 20L)
  ).toDF("user_id", "us", "event_id")

  test("sessionize: strict-gap boundaries, per-entity numbering") {
    val got = Sessions.sessionize(events, "user_id", col("us"),
        col("event_id"), gap)
      .select(col("event_id"), col("session_idx"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(10L -> 1L, 11L -> 1L, 12L -> 2L, 13L -> 2L, 20L -> 1L))
  }

  test("sessionize: timestamp ties resolved by the tiebreak column") {
    val tied = Seq((1L, 5L, 2L), (1L, 5L, 1L)).toDF("user_id", "us", "event_id")
    val got = Sessions.sessionize(tied, "user_id", col("us"),
        col("event_id"), gap)
      .select(col("event_id"), col("session_idx"))
      .as[(Long, Long)].collect().toMap
    // both in session 1 regardless of input order; the ROWS frame must not
    // double-count peer rows
    assert(got === Map(1L -> 1L, 2L -> 1L))
  }

  test("sessionStats: counts and bounds per session") {
    val got = Sessions.sessionStats(events, "user_id", col("us"),
        col("event_id"), gap)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 1L, 2L, 0L, 50_000_000L),
      (1L, 2L, 2L, 200_000_000L, 300_000_000L),
      (2L, 1L, 1L, 999L, 999L)))
  }

  test("chunked sessionize rejects a non-integral ts up front (ADVICE r6)") {
    // the exact-long `div` in the chunk formula would otherwise fail
    // analysis with a cryptic type mismatch — same contract AsOf
    // enforces via requireIntegralTs
    val dbl = Seq((1L, 1.5, 10L)).toDF("user_id", "us", "event_id")
    val e = intercept[IllegalArgumentException] {
      Sessions.sessionize(dbl, "user_id", col("us"), col("event_id"),
        gap, chunkWidth = Some(10L))
    }
    assert(e.getMessage.contains("integral"))
  }

  test("randomized: matches an independent in-memory reference model") {
    val rnd = new scala.util.Random(42)
    val evs = for {
      u <- 1L to 5L
      i <- 1 to 300
    } yield (u, math.abs(rnd.nextLong() % 10_000_000_000L), u * 10000 + i)
    val gapUs = 50_000_000L
    // plain-Scala reference: sort per user, cut at strict-gap violations
    val want = evs.groupBy(_._1).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      var idx = 0L
      var prev = Long.MinValue
      sorted.map { case (_, us, id) =>
        if (prev == Long.MinValue || us - prev > gapUs) idx += 1
        prev = us
        id -> idx
      }
    }
    val got = Sessions.sessionize(
        evs.toDF("user_id", "us", "event_id").repartition(7),
        "user_id", col("us"), col("event_id"),
        java.time.Duration.ofMillis(gapUs / 1000))
      .select(col("event_id"), col("session_idx"))
      .as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("chunked (hot-key-safe) sessionize: identical indices for every width, hot key included") {
    // VERDICT r4 #3: one bot entity carries ~90% of events. Gap 50 ms;
    // widths span sub-gap (every session crosses chunks), near-gap, and
    // beyond-domain (single chunk ≡ plain path).
    val rnd = new scala.util.Random(53)
    val gapUs = 50_000L
    val evs = (1 to 2000).map { i =>
      val u = if (rnd.nextInt(10) < 9) 1L else rnd.nextInt(4).toLong + 2L
      (u, math.abs(rnd.nextLong() % 100_000_000L), i.toLong)
    }
    val df = evs.toDF("user_id", "us", "event_id").repartition(7)
    // autoChunk OFF: this test wants the genuinely-plain single-window
    // reference (the fixture is 90%-hot, so auto would engage)
    val plain = Sessions.sessionize(df, "user_id", col("us"),
        col("event_id"), java.time.Duration.ofNanos(gapUs * 1000),
        autoChunk = false)
      .select(col("event_id"), col("session_idx"))
      .as[(Long, Long)].collect().toMap
    for (w <- Seq(1_000L, 49_999L, 50_000L, 777_777L, 1_000_000_000L)) {
      val got = Sessions.sessionize(df, "user_id", col("us"),
          col("event_id"), java.time.Duration.ofNanos(gapUs * 1000),
          chunkWidth = Some(w))
        .select(col("event_id"), col("session_idx"))
        .as[(Long, Long)].collect().toMap
      assert(got === plain, s"width $w")
    }
  }

  test("autoChunk: engages on a 90%-hot entity, stays off on uniform (VERDICT r5 #4)") {
    val rnd = new scala.util.Random(73)
    val gap = java.time.Duration.ofNanos(50_000L * 1000)
    val hot = (1 to 800).map { i =>
      val u = if (rnd.nextInt(10) < 9) 1L else rnd.nextInt(4).toLong + 2L
      (u, math.abs(rnd.nextLong() % 100_000_000L), i.toLong)
    }.toDF("user_id", "us", "event_id").repartition(7)
    val auto = Sessions.sessionize(hot, "user_id", col("us"),
      col("event_id"), gap)
    assert(auto.queryExecution.executedPlan.toString.contains("__ck"),
      "auto mode must pick the chunked plan on a 90%-hot entity")
    val plain = Sessions.sessionize(hot, "user_id", col("us"),
      col("event_id"), gap, autoChunk = false)
    assert(!plain.queryExecution.executedPlan.toString.contains("__ck"))
    assert(auto.select(col("event_id"), col("session_idx"))
        .as[(Long, Long)].collect().toMap ===
      plain.select(col("event_id"), col("session_idx"))
        .as[(Long, Long)].collect().toMap,
      "auto-chunked indices must equal the plain plan's")

    val uniform = (1 to 800).map { i =>
      (rnd.nextInt(8).toLong, math.abs(rnd.nextLong() % 100_000_000L), i.toLong)
    }.toDF("user_id", "us", "event_id").repartition(7)
    val uAuto = Sessions.sessionize(uniform, "user_id", col("us"),
      col("event_id"), gap)
    assert(!uAuto.queryExecution.executedPlan.toString.contains("__ck"),
      "auto mode must keep the plain plan on uniform entities")
  }

  test("chunked path: NULL entities sessionize like the plain path (null-safe offsets join)") {
    // ADVICE r5: the window path puts null entities in their own
    // partition and indexes them; the chunked offsets join must be
    // null-safe or every null-entity event silently disappears.
    val rnd = new scala.util.Random(61)
    val evs = (1 to 600).map { i =>
      val u = rnd.nextInt(4)
      (if (u == 0) None else Some(u.toLong),
        math.abs(rnd.nextLong() % 10_000_000L), i.toLong)
    }
    val df = evs.toDF("user_id", "us", "event_id").repartition(5)
    val plain = Sessions.sessionize(df, "user_id", col("us"),
        col("event_id"), java.time.Duration.ofNanos(50_000L * 1000))
      .select(col("event_id"), col("session_idx"))
      .as[(Long, Long)].collect().toMap
    assert(plain.size == 600, "every event (null entities too) gets an index")
    for (w <- Seq(10_000L, 777_777L)) {
      val got = Sessions.sessionize(df, "user_id", col("us"),
          col("event_id"), java.time.Duration.ofNanos(50_000L * 1000),
          chunkWidth = Some(w))
        .select(col("event_id"), col("session_idx"))
        .as[(Long, Long)].collect().toMap
      assert(got === plain, s"width $w")
    }
  }

  test("chunked path: exact for raw NANOSECOND-scale timestamps (above 2^53)") {
    // ADVICE r5: the chunk formula divides in long (`div`), so nano-scale
    // epoch values (~1.7e18, above double's exact window) chunk correctly.
    val base = 1700000000000000000L
    val rnd = new scala.util.Random(67)
    val evs = (1 to 500).map { i =>
      (rnd.nextInt(3).toLong + 1L, base + rnd.nextInt(1000).toLong, i.toLong)
    }
    val df = evs.toDF("user_id", "us", "event_id").repartition(5)
    val plain = Sessions.sessionize(df, "user_id", col("us"),
        col("event_id"), java.time.Duration.ofNanos(20L * 1000))
      .select(col("event_id"), col("session_idx"))
      .as[(Long, Long)].collect().toMap
    for (w <- Seq(7L, 100L)) {
      val got = Sessions.sessionize(df, "user_id", col("us"),
          col("event_id"), java.time.Duration.ofNanos(20L * 1000),
          chunkWidth = Some(w))
        .select(col("event_id"), col("session_idx"))
        .as[(Long, Long)].collect().toMap
      assert(got === plain, s"width $w")
    }
  }

  test("sessionStats plans ONE shuffle: the groupBy reuses the window's partitioning") {
    // autoChunk off: this pins the PLAIN plan's one-shuffle shape (the
    // tiny fixture has few distinct users, so the auto probe would engage)
    val df = Sessions.sessionStats(events.repartition(4), "user_id",
      col("us"), col("event_id"), gap, autoChunk = false)
    df.collect()
    // AQE's toString prints the final AND initial plans — count only the
    // final section or every exchange double-counts
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1,
      s"expected 1 hash exchange (window), found $shuffles:\n${plan.take(3000)}")
  }
}
