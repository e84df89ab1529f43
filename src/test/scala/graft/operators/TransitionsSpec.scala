package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Event-type transition matrix (L132). Hand-pinned adjacency under the
  * (us, id) total order, per-entity isolation, timestamp-tie
  * determinism, null hygiene, the row-sum floor bound, and a seeded
  * plain-Scala replay. */
class TransitionsSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long, String)]) =
    Transitions.matrix(rows.toDF("user_id", "us", "event_id", "et"),
        "user_id", col("us"), "event_id", "et")
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Long, Long)].collect().toSeq

  test("hand sequence: a→b→a→c gives the expected counts and exact ppm") {
    val got = run(Seq((1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"),
      (1L, 30L, 3L, "a"), (1L, 40L, 4L, "c")))
    assert(got === Seq(
      ("a", "b", 1L, 2L, 500000L),
      ("a", "c", 1L, 2L, 500000L),
      ("b", "a", 1L, 1L, 1000000L)))
  }

  test("transitions never cross entities") {
    val got = run(Seq((1L, 10L, 1L, "a"), (2L, 20L, 2L, "b"),
      (1L, 30L, 3L, "c")))
    assert(got === Seq(("a", "c", 1L, 1L, 1000000L))) // never a→b
  }

  test("timestamp ties order by event_id — deterministic") {
    val got = run(Seq((1L, 10L, 2L, "b"), (1L, 10L, 1L, "a"),
      (1L, 10L, 3L, "c")))
    assert(got.map(p => (p._1, p._2)) === Seq(("a", "b"), ("b", "c")))
  }

  test("null entity/type/id/us rows drop") {
    val df = Seq(
      (Option(1L), Option(10L), Option(1L), Option("a")),
      (Option(1L), Option(20L), Option(2L), Option("b")),
      (Option.empty[Long], Option(30L), Option(3L), Option("x")),
      (Option(1L), Option.empty[Long], Option(4L), Option("x")),
      (Option(1L), Option(40L), Option.empty[Long], Option("x")),
      (Option(1L), Option(50L), Option(5L), Option.empty[String])
    ).toDF("user_id", "us", "event_id", "et")
    val got = Transitions.matrix(df, "user_id", col("us"), "event_id",
        "et").as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("a", "b", 1L, 1L, 1000000L)))
  }

  test("row ppm sums land in [1e6 − (row_width − 1), 1e6] (floor slack)") {
    val rnd = new scala.util.Random(81)
    val types = Vector("a", "b", "c", "d")
    val rows = (0 until 400).map(i => ((i % 7).toLong, i.toLong * 10,
      i.toLong, types(rnd.nextInt(types.size))))
    val byFrom = run(rows).groupBy(_._1)
    for ((f, ts) <- byFrom) {
      val s = ts.map(_._5).sum
      assert(s <= 1000000L && s >= 1000000L - (ts.size - 1),
        s"row $f ppm sum $s over ${ts.size} cells")
    }
  }

  test("chunked ≡ plain on seeded streams including a 90%-hot entity") {
    val rnd = new scala.util.Random(84)
    val types = Vector("p", "q", "r", "s")
    // 90% of rows belong to entity 0 (the hot-key regime the chunked
    // plan exists for), clustered in time; the rest spread over 8
    val rows = (0 until 500).map { i =>
      val e = if (rnd.nextInt(10) < 9) 0L else (1 + rnd.nextInt(8)).toLong
      (e, rnd.nextInt(1000).toLong, i.toLong, types(rnd.nextInt(types.size)))
    }
    val df = rows.toDF("user_id", "us", "event_id", "et")
    val plain = Transitions.matrix(df, "user_id", col("us"), "event_id",
        "et").orderBy("from_type", "to_type")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    for (width <- Seq(1L, 7L, 100L, 5000L)) { // incl. one-row chunks and
      val chunked = Transitions.matrixChunked(df, "user_id", col("us"),
          "event_id", "et", width)                 // one-chunk-fits-all
        .orderBy("from_type", "to_type")
        .as[(String, String, Long, Long, Long)].collect().toSeq
      assert(chunked === plain, s"width=$width")
    }
  }

  test("stationary: a 2-cycle splits evenly; a sink absorbs; Σ = 1e6 exactly") {
    // a <-> b forever: stationary = (1/2, 1/2) exactly
    val cyc = run2(Seq((1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"),
      (1L, 30L, 3L, "a"), (1L, 40L, 4L, "b"), (1L, 50L, 5L, "a")))
    val cycPi = Transitions.stationary(cyc, rounds = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cycPi === Map("a" -> 500000L, "b" -> 500000L))
    // a -> s and s -> s: the sink absorbs everything that iterates
    val sink = run2(Seq((1L, 10L, 1L, "a"), (1L, 20L, 2L, "s"),
      (1L, 30L, 3L, "s"), (1L, 40L, 4L, "s")))
    val sinkPi = Transitions.stationary(sink, rounds = 12)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sinkPi("s") === 1000000L && sinkPi("a") === 0L)
    // seeded: the invariant holds whatever the mix
    val rnd = new scala.util.Random(85)
    val types = Vector("a", "b", "c", "d")
    val m = run2((0 until 200).map(i => ((i % 6).toLong,
      rnd.nextInt(500).toLong, i.toLong, types(rnd.nextInt(4)))))
    val pi = Transitions.stationary(m, rounds = 6).collect()
    assert(pi.map(_.getLong(1)).sum === 1000000L)
  }

  private def run2(rows: Seq[(Long, Long, Long, String)]) =
    Transitions.matrix(rows.toDF("user_id", "us", "event_id", "et"),
      "user_id", col("us"), "event_id", "et")

  test("matches a plain-Scala replay on seeded streams") {
    val rnd = new scala.util.Random(82)
    val types = Vector("v", "w", "x", "y", "z")
    val rows = (0 until 300).map { i =>
      ((rnd.nextInt(9)).toLong, rnd.nextInt(50).toLong, i.toLong,
        types(rnd.nextInt(types.size)))
    }
    val got = run(rows)
    val pairs = rows.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      es.sortBy(e => (e._2, e._3)).map(_._4).sliding(2)
        .collect { case Seq(a, b) => (a, b) }
    }
    val counts = pairs.groupBy(identity).map { case (k, v) =>
      k -> v.size.toLong }
    val rowN = counts.toSeq.groupBy(_._1._1).map { case (f, cs) =>
      f -> cs.map(_._2).sum }
    val want = counts.toSeq.map { case ((f, t0), n) =>
      (f, t0, n, rowN(f), n * 1000000L / rowN(f))
    }.sortBy(p => (p._1, p._2))
    assert(got === want)
  }
}
