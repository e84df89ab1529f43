package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq(
    (1L, 5L, "p5"), (1L, 10L, "p10"), (1L, 25L, "p25"), (2L, 5L, "q5"))
    .toDF("k", "t", "pid")
  private def intervals = Seq(
    (1L, 0L, 9L, "a"), (1L, 10L, 19L, "b"), (1L, 3L, 12L, "c"),
    (2L, 50L, 60L, "d"), (1L, 30L, 20L, "bad"))
    .toDF("k", "lo", "hi", "iid")

  test("every containing interval matches exactly once; inverted intervals dropped") {
    for (w <- Seq(1L, 3L, 7L, 100L)) { // bucket width must not change results
      val got = RangeJoin.pointInInterval(points, intervals, Seq("k"),
          "t", "lo", "hi", bucketWidth = w)
        .select("pid", "iid").as[(String, String)].collect().toSet
      assert(got === Set(
        ("p5", "a"), ("p5", "c"),   // 5 in [0,9] and [3,12]
        ("p10", "b"), ("p10", "c")  // 10 in [10,19] (boundary) and [3,12]
        // p25 in no interval; q5's key-2 interval is [50,60]; "bad" dropped
      ), s"bucketWidth=$w")
    }
  }

  test("boundary containment is inclusive on both ends; exact multiples of width") {
    val p = Seq((1L, 0L, "lo"), (1L, 9L, "hi"), (1L, 10L, "out"))
      .toDF("k", "t", "pid")
    val i = Seq((1L, 0L, 9L, "a")).toDF("k", "lo", "hi", "iid")
    val got = RangeJoin.pointInInterval(p, i, Seq("k"), "t", "lo", "hi", 5L)
      .select("pid").as[String].collect().toSet
    assert(got === Set("lo", "hi"))
  }

  test("negative domains bucket correctly (floor, not truncate-toward-zero)") {
    val p = Seq((1L, -7L, "n")).toDF("k", "t", "pid")
    val i = Seq((1L, -10L, -5L, "neg")).toDF("k", "lo", "hi", "iid")
    val got = RangeJoin.pointInInterval(p, i, Seq("k"), "t", "lo", "hi", 4L)
      .select("pid", "iid").as[(String, String)].collect()
    assert(got.toSeq === Seq(("n", "neg")))
  }

  test("property: matches a brute-force reference on random data (seeded)") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 10) {
      val ps = List.fill(rnd.nextInt(40) + 10)(
        (rnd.nextInt(3).toLong, rnd.nextInt(200).toLong - 100))
        .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val is = List.fill(rnd.nextInt(20) + 5) {
        val a = rnd.nextInt(200).toLong - 100
        val b = rnd.nextInt(200).toLong - 100
        (rnd.nextInt(3).toLong, a, b)
      }.zipWithIndex.map { case ((k, a, b), i) => (k, a, b, i.toLong + 1000) }
      val w = rnd.nextInt(29).toLong + 1
      val got = RangeJoin.pointInInterval(
          ps.toDF("k", "t", "pid"), is.toDF("k", "lo", "hi", "iid"),
          Seq("k"), "t", "lo", "hi", w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      val want = (for {
        (pk, t, pid) <- ps
        (ik, lo, hi, iid) <- is
        if pk == ik && lo <= hi && t >= lo && t <= hi
      } yield (pid, iid)).toSet
      assert(got === want, s"trial $trial w=$w")
    }
  }

  test("intervalOverlap: overlapping pairs exactly once, width-invariant") {
    val a = Seq((1L, 0L, 10L, "a1"), (1L, 20L, 30L, "a2"), (2L, 0L, 5L, "a3"))
      .toDF("k", "alo", "ahi", "aid")
    val b = Seq((1L, 5L, 25L, "b1"), (1L, 10L, 12L, "b2"),
      (1L, 31L, 40L, "b3"), (2L, 6L, 9L, "b4"), (1L, 9L, 2L, "bad"))
      .toDF("k", "blo", "bhi", "bid")
    for (w <- Seq(1L, 4L, 13L, 1000L)) {
      val got = RangeJoin.intervalOverlap(a, b, Seq("k"),
          "alo", "ahi", "blo", "bhi", bucketWidth = w)
        .select("aid", "bid").as[(String, String)].collect().toList
      // a1∩b1 ([5,10]), a1∩b2 (at 10, boundary), a2∩b1 ([20,25]);
      // b3 starts past a2; key-2 intervals touch nothing; "bad" inverted
      assert(got.sorted === List("a1" -> "b1", "a1" -> "b2", "a2" -> "b1"),
        s"bucketWidth=$w (duplicates would show here)")
    }
  }

  test("intervalOverlap property: brute-force reference, exactly-once (seeded)") {
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 10) {
      def ivs(n: Int, base: Long) = List.fill(n) {
        val a = rnd.nextInt(200).toLong - 100
        (rnd.nextInt(3).toLong, a, a + rnd.nextInt(40) - 5)
      }.zipWithIndex.map { case ((k, lo, hi), i) => (k, lo, hi, base + i) }
      val as = ivs(rnd.nextInt(25) + 5, 0)
      val bs = ivs(rnd.nextInt(25) + 5, 1000)
      val w = rnd.nextInt(29).toLong + 1
      val got = RangeJoin.intervalOverlap(
          as.toDF("k", "alo", "ahi", "aid"), bs.toDF("k", "blo", "bhi", "bid"),
          Seq("k"), "alo", "ahi", "blo", "bhi", w)
        .select("aid", "bid").as[(Long, Long)].collect().toList
      val want = for {
        (ak, alo, ahi, aid) <- as
        (bk, blo, bhi, bid) <- bs
        if ak == bk && alo <= ahi && blo <= bhi && alo <= bhi && blo <= ahi
      } yield (aid, bid)
      // list-vs-list: equal as SETS and free of duplicate emissions
      assert(got.sorted === want.sorted, s"trial $trial w=$w")
    }
  }

  test("plans as a hash join on (key, bucket) — no nested loop, no cartesian") {
    val df = RangeJoin.pointInInterval(points, intervals, Seq("k"),
      "t", "lo", "hi", 5L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"range join degenerated to a pair scan:\n$plan")
  }
}
