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
    val plain = Sessions.sessionize(df, "user_id", col("us"),
        col("event_id"), java.time.Duration.ofNanos(gapUs * 1000))
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

  test("sessionStats plans ONE shuffle: the groupBy reuses the window's partitioning") {
    val df = Sessions.sessionStats(events.repartition(4), "user_id",
      col("us"), col("event_id"), gap)
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
