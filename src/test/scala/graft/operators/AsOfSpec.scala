package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, 10L, "a"), (1L, 5L, "b"), (1L, 4L, "c"), (2L, 7L, "d"))
    .toDF("k", "ts", "lid")
  private def right = Seq(
    (1L, 5L, 100L, 1.0), (1L, 5L, 101L, 2.0), (1L, 9L, 102L, 3.0),
    (3L, 1L, 103L, 9.0))
    .toDF("k", "rts", "rid", "v")

  test("latest prior-or-equal payload; equal-ts ties take the largest tieBreak; no match -> nulls") {
    val got = AsOf.joinPriorOrEqual(left, right, Seq("k"), "ts", "rts", "rid")
      .select("lid", "rid", "v").as[(String, Option[Long], Option[Double])]
      .collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      ("a", Some(102L), Some(3.0)), // ts=10 sees the ts=9 row
      ("b", Some(101L), Some(2.0)), // equal ts visible; tie -> larger rid
      ("c", None, None),            // ts=4 predates every right row
      ("d", None, None)))           // no right rows for k=2
  }

  test("result is layout-stable and null timestamps are dropped") {
    val a = AsOf.joinPriorOrEqual(left, right, Seq("k"), "ts", "rts", "rid")
      .select("lid", "rid").as[(String, Option[Long])].collect().toSet
    val b = AsOf.joinPriorOrEqual(left.repartition(7), right.repartition(3),
        Seq("k"), "ts", "rts", "rid")
      .select("lid", "rid").as[(String, Option[Long])].collect().toSet
    assert(a === b)
    // a null left timestamp cannot be placed on the timeline -> dropped
    val withNull = Seq((Some(1L), Option.empty[Long], Some("z"))).toDF("k", "ts", "lid")
    val got = AsOf.joinPriorOrEqual(withNull, right, Seq("k"), "ts", "rts", "rid")
    assert(got.count() === 0)
  }

  test("property: matches a brute-force latest-prior reference on random data (seeded)") {
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 10) {
      // small ts domain on purpose: equal-timestamp collisions (left-right
      // AND right-right) must occur so the tie rules are actually exercised
      val ls = List.fill(rnd.nextInt(30) + 5)(
        (rnd.nextInt(3).toLong, rnd.nextInt(20).toLong))
        .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val rs = List.fill(rnd.nextInt(30) + 5)(
        (rnd.nextInt(3).toLong, rnd.nextInt(20).toLong))
        .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong + 1000) }
      val got = AsOf.joinPriorOrEqual(
          ls.toDF("k", "ts", "lid"), rs.toDF("k", "rts", "rid"),
          Seq("k"), "ts", "rts", "rid")
        .select("lid", "rid").as[(Long, Option[Long])].collect().toSet
      val want = ls.map { case (k, t, lid) =>
        val cands = rs.filter { case (rk, rt, _) => rk == k && rt <= t }
        lid -> (if (cands.isEmpty) None
                else Some(cands.maxBy { case (_, rt, rid) => (rt, rid) }._3))
      }.toSet
      assert(got === want, s"trial $trial")
    }
  }

  test("chunked (hot-key-safe) path: identical results for every chunk width") {
    // fixed example across widths spanning sub-gap to whole-domain
    for (w <- Seq(1L, 3L, 7L, 1000L)) {
      val got = AsOf.joinPriorOrEqual(left, right, Seq("k"), "ts", "rts",
          "rid", chunkWidth = Some(w))
        .select("lid", "rid", "v").as[(String, Option[Long], Option[Double])]
        .collect().sortBy(_._1)
      assert(got.toSeq === Seq(
        ("a", Some(102L), Some(3.0)), ("b", Some(101L), Some(2.0)),
        ("c", None, None), ("d", None, None)), s"width $w")
    }
  }

  test("chunked property: equals the plain path on a deliberately HOT key (seeded)") {
    // VERDICT r4 #3: one bot key carries ~90% of all rows; the chunked
    // plan must split it across (key, chunk) partitions and still agree
    // with the single-partition-per-key plain plan, boundary collisions
    // and left-only/right-only chunks included.
    val rnd = new scala.util.Random(37)
    val hotKey = 1L
    def key() = if (rnd.nextInt(10) < 9) hotKey else rnd.nextInt(3).toLong + 2L
    val ls = List.fill(400)((key(), rnd.nextInt(100).toLong))
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
    val rs = List.fill(400)((key(), rnd.nextInt(100).toLong))
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong + 10000) }
    val lDf = ls.toDF("k", "ts", "lid").repartition(7)
    val rDf = rs.toDF("k", "rts", "rid").repartition(5)
    // autoChunk OFF: this test wants the genuinely-plain single-window
    // plan as the reference (the fixture is 90%-hot, so auto would engage)
    val plain = AsOf.joinPriorOrEqual(lDf, rDf, Seq("k"), "ts", "rts", "rid",
        autoChunk = false)
      .select("lid", "rid").as[(Long, Option[Long])].collect().toSet
    for (w <- Seq(1L, 9L, 17L, 1000L)) {
      val chunkedDf = AsOf.joinPriorOrEqual(lDf, rDf, Seq("k"), "ts", "rts",
        "rid", chunkWidth = Some(w))
      val chunked = chunkedDf.select("lid", "rid")
        .as[(Long, Option[Long])].collect().toSet
      assert(chunked === plain, s"width $w")
      val plan = chunkedDf.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoop"), s"width $w pair blowup")
      // the event-sized window really partitions one level finer
      assert(plan.contains("__ck"), s"width $w must window by (key, chunk)")
    }
  }

  test("strict (<) visibility: an equal-ts right row is not seen") {
    // left 'b' sits at ts=5 where two right rows also sit: inclusive
    // takes the larger-rid one; strict must fall back to... nothing
    // earlier exists below 5 for k=1 except nothing -> null
    val got = AsOf.joinPriorOrEqual(left, right, Seq("k"), "ts", "rts",
        "rid", inclusive = false)
      .select("lid", "rid").as[(String, Option[Long])]
      .collect().toMap
    assert(got("a") === Some(102L)) // 10 > 9, unaffected
    assert(got("b") === None)       // equal-ts rows invisible, none before
    assert(got("c") === None)
  }

  test("tolerance: matches older than leftTs - t null out (plain and chunked)") {
    // left 'a' at ts=10 matches rid=102 at rts=9 (age 1); tolerance 0
    // discards it, tolerance 1 keeps it
    for (cw <- Seq(None, Some(3L))) {
      val keep = AsOf.joinPriorOrEqual(left, right, Seq("k"), "ts", "rts",
          "rid", chunkWidth = cw, tolerance = Some(1L))
        .select("lid", "rid").as[(String, Option[Long])].collect().toMap
      assert(keep("a") === Some(102L), s"cw=$cw")
      val drop = AsOf.joinPriorOrEqual(left, right, Seq("k"), "ts", "rts",
          "rid", chunkWidth = cw, tolerance = Some(0L))
        .select("lid", "rid").as[(String, Option[Long])].collect().toMap
      assert(drop("a") === None, s"cw=$cw")
      // equal-ts match has age 0 — survives tolerance 0
      assert(drop("b") === Some(101L), s"cw=$cw")
    }
  }

  test("property: strict and tolerance match a brute-force reference (seeded, both plans)") {
    val rnd = new scala.util.Random(47)
    for (trial <- 1 to 6) {
      val ls = List.fill(60)((rnd.nextInt(3).toLong, rnd.nextInt(20).toLong))
        .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val rs = List.fill(60)((rnd.nextInt(3).toLong, rnd.nextInt(20).toLong))
        .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong + 1000) }
      val lDf = ls.toDF("k", "ts", "lid")
      val rDf = rs.toDF("k", "rts", "rid")
      val tol = rnd.nextInt(6).toLong
      def want(strict: Boolean, tolOpt: Option[Long]) = ls.map {
        case (k, t, lid) =>
          val cands = rs.filter { case (rk, rt, _) =>
            rk == k && (if (strict) rt < t else rt <= t) &&
              tolOpt.forall(tl => rt >= t - tl)
          }
          lid -> (if (cands.isEmpty) None
                  else Some(cands.maxBy { case (_, rt, rid) => (rt, rid) }._3))
      }.toSet
      for (cw <- Seq(None, Some(rnd.nextInt(9) + 1L))) {
        val strictGot = AsOf.joinPriorOrEqual(lDf, rDf, Seq("k"), "ts",
            "rts", "rid", chunkWidth = cw, inclusive = false)
          .select("lid", "rid").as[(Long, Option[Long])].collect().toSet
        assert(strictGot === want(strict = true, None), s"trial $trial cw=$cw strict")
        val tolGot = AsOf.joinPriorOrEqual(lDf, rDf, Seq("k"), "ts",
            "rts", "rid", chunkWidth = cw, tolerance = Some(tol))
          .select("lid", "rid").as[(Long, Option[Long])].collect().toSet
        assert(tolGot === want(strict = false, Some(tol)),
          s"trial $trial cw=$cw tol=$tol")
      }
    }
  }

  test("chunked path: composite keys and null timestamps behave like the plain path") {
    val rnd = new scala.util.Random(41)
    val ls = List.fill(200)((rnd.nextInt(3).toLong, rnd.nextInt(2).toLong,
        rnd.nextInt(40).toLong))
      .zipWithIndex.map { case ((k1, k2, t), i) =>
        (k1, k2, if (t == 0) None else Some(t), i.toLong) }
    val rs = List.fill(200)((rnd.nextInt(3).toLong, rnd.nextInt(2).toLong,
        rnd.nextInt(40).toLong))
      .zipWithIndex.map { case ((k1, k2, t), i) =>
        (k1, k2, if (t == 0) None else Some(t), i.toLong + 5000) }
    val lDf = ls.toDF("k1", "k2", "ts", "lid")
    val rDf = rs.toDF("k1", "k2", "rts", "rid")
    val plain = AsOf.joinPriorOrEqual(lDf, rDf, Seq("k1", "k2"), "ts",
        "rts", "rid")
      .select("lid", "rid").as[(Long, Option[Long])].collect().toSet
    val chunked = AsOf.joinPriorOrEqual(lDf, rDf, Seq("k1", "k2"), "ts",
        "rts", "rid", chunkWidth = Some(7L))
      .select("lid", "rid").as[(Long, Option[Long])].collect().toSet
    assert(chunked === plain)
  }

  test("autoChunk: engages on a 90%-hot key, stays off on uniform keys (VERDICT r5 #4)") {
    val rnd = new scala.util.Random(71)
    // hot fixture: one key carries ~90% of both sides
    def hotKey() = if (rnd.nextInt(10) < 9) 1L else rnd.nextInt(3).toLong + 2L
    val hl = List.fill(300)((hotKey(), rnd.nextInt(100).toLong))
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
    val hr = List.fill(300)((hotKey(), rnd.nextInt(100).toLong))
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong + 9000) }
    val hlDf = hl.toDF("k", "ts", "lid").repartition(7)
    val hrDf = hr.toDF("k", "rts", "rid").repartition(5)
    val auto = AsOf.joinPriorOrEqual(hlDf, hrDf, Seq("k"), "ts", "rts", "rid")
    assert(auto.queryExecution.executedPlan.toString.contains("__ck"),
      "auto mode must pick the chunked plan on a 90%-hot key")
    val plain = AsOf.joinPriorOrEqual(hlDf, hrDf, Seq("k"), "ts", "rts",
        "rid", autoChunk = false)
    assert(!plain.queryExecution.executedPlan.toString.contains("__ck"))
    assert(auto.select("lid", "rid").as[(Long, Option[Long])].collect().toSet
      === plain.select("lid", "rid").as[(Long, Option[Long])].collect().toSet,
      "auto-chunked results must equal the plain plan's")

    // uniform fixture: hottest share ~1/6 — far under the 0.4 threshold
    val ul = List.fill(300)((rnd.nextInt(6).toLong, rnd.nextInt(100).toLong))
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
    val ur = List.fill(300)((rnd.nextInt(6).toLong, rnd.nextInt(100).toLong))
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong + 9000) }
    val uAuto = AsOf.joinPriorOrEqual(ul.toDF("k", "ts", "lid").repartition(7),
      ur.toDF("k", "rts", "rid").repartition(5), Seq("k"), "ts", "rts", "rid")
    assert(!uAuto.queryExecution.executedPlan.toString.contains("__ck"),
      "auto mode must keep the plain single-window plan on uniform keys")
    // explicit width still wins over the probe
    val forced = AsOf.joinPriorOrEqual(
      ul.toDF("k", "ts", "lid"), ur.toDF("k", "rts", "rid"),
      Seq("k"), "ts", "rts", "rid", chunkWidth = Some(13L))
    assert(forced.queryExecution.executedPlan.toString.contains("__ck"))
  }

  test("chunked path: NULL keys match like the plain path (null-safe carry join)") {
    // ADVICE r5: the window's partitionBy groups null keys into their own
    // partition (null left rows match null right rows), so the chunked
    // carry join must be null-safe — a plain inner equi-join silently
    // dropped every null-keyed left row.
    val rnd = new scala.util.Random(53)
    val ls = List.fill(150)((rnd.nextInt(4), rnd.nextInt(40).toLong))
      .zipWithIndex.map { case ((k, t), i) =>
        (if (k == 0) None else Some(k.toLong), t, i.toLong) }
    val rs = List.fill(150)((rnd.nextInt(4), rnd.nextInt(40).toLong))
      .zipWithIndex.map { case ((k, t), i) =>
        (if (k == 0) None else Some(k.toLong), t, i.toLong + 5000) }
    val lDf = ls.toDF("k", "ts", "lid")
    val rDf = rs.toDF("k", "rts", "rid")
    val plain = AsOf.joinPriorOrEqual(lDf, rDf, Seq("k"), "ts", "rts", "rid")
      .select("lid", "rid").as[(Long, Option[Long])].collect().toSet
    assert(plain.size == 150, "every left row survives the plain path")
    // null-keyed left rows really do match null-keyed right rows
    assert(plain.exists { case (lid, rid) =>
      ls.exists(l => l._3 == lid && l._1.isEmpty) && rid.nonEmpty })
    for (w <- Seq(1L, 7L, 1000L)) {
      val chunked = AsOf.joinPriorOrEqual(lDf, rDf, Seq("k"), "ts", "rts",
          "rid", chunkWidth = Some(w))
        .select("lid", "rid").as[(Long, Option[Long])].collect().toSet
      assert(chunked === plain, s"width $w")
    }
  }

  test("chunked path: exact for raw NANOSECOND-scale timestamps (above 2^53)") {
    // ADVICE r5: chunkOf must divide in long — the old double division is
    // only exact below 2^53, and the repo reads parquet timestamps as
    // nano longs (~1.7e18). Timeline clustered near 1.7e18 with 1-unit
    // gaps; every width must agree with the plain plan.
    val base = 1700000000000000000L // well above 2^53
    val rnd = new scala.util.Random(59)
    val ls = List.fill(120)((rnd.nextInt(3).toLong, base + rnd.nextInt(50)))
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
    val rs = List.fill(120)((rnd.nextInt(3).toLong, base + rnd.nextInt(50)))
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong + 5000) }
    val lDf = ls.toDF("k", "ts", "lid")
    val rDf = rs.toDF("k", "rts", "rid")
    val plain = AsOf.joinPriorOrEqual(lDf, rDf, Seq("k"), "ts", "rts", "rid")
      .select("lid", "rid").as[(Long, Option[Long])].collect().toSet
    for (w <- Seq(1L, 3L, 13L)) {
      val chunked = AsOf.joinPriorOrEqual(lDf, rDf, Seq("k"), "ts", "rts",
          "rid", chunkWidth = Some(w))
        .select("lid", "rid").as[(Long, Option[Long])].collect().toSet
      assert(chunked === plain, s"width $w")
    }
  }

  test("joinFollowing: next-after mirror matches a brute-force reference (all variants, both plans)") {
    // mirror conventions: EARLIEST right row at-or-after leftTs; equal-ts
    // ties take the SMALLEST tieBreak; strict makes the same-instant row
    // invisible; tolerance bounds how far AHEAD the match may be.
    val rnd = new scala.util.Random(83)
    for (trial <- 1 to 6) {
      val ls = List.fill(60)((rnd.nextInt(3).toLong, rnd.nextInt(20).toLong))
        .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val rs = List.fill(60)((rnd.nextInt(3).toLong, rnd.nextInt(20).toLong))
        .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong + 1000) }
      val lDf = ls.toDF("k", "ts", "lid")
      val rDf = rs.toDF("k", "rts", "rid")
      val tol = rnd.nextInt(6).toLong
      def want(strict: Boolean, tolOpt: Option[Long]) = ls.map {
        case (k, t, lid) =>
          val cands = rs.filter { case (rk, rt, _) =>
            rk == k && (if (strict) rt > t else rt >= t) &&
              tolOpt.forall(tl => rt <= t + tl)
          }
          lid -> (if (cands.isEmpty) None
                  else Some(cands.minBy { case (_, rt, rid) => (rt, rid) }._3))
      }.toSet
      for (cw <- Seq(None, Some(rnd.nextInt(9) + 1L))) {
        val incl = AsOf.joinFollowing(lDf, rDf, Seq("k"), "ts", "rts",
            "rid", chunkWidth = cw)
          .select("lid", "rid").as[(Long, Option[Long])].collect().toSet
        assert(incl === want(strict = false, None), s"trial $trial cw=$cw")
        val strictGot = AsOf.joinFollowing(lDf, rDf, Seq("k"), "ts", "rts",
            "rid", chunkWidth = cw, inclusive = false)
          .select("lid", "rid").as[(Long, Option[Long])].collect().toSet
        assert(strictGot === want(strict = true, None),
          s"trial $trial cw=$cw strict")
        val tolGot = AsOf.joinFollowing(lDf, rDf, Seq("k"), "ts", "rts",
            "rid", chunkWidth = cw, tolerance = Some(tol))
          .select("lid", "rid").as[(Long, Option[Long])].collect().toSet
        assert(tolGot === want(strict = false, Some(tol)),
          s"trial $trial cw=$cw tol=$tol")
      }
    }
  }

  test("joinNearest: closest-in-time match, prior wins ties, tolerance bounds both sides (both plans)") {
    val rnd = new scala.util.Random(89)
    for (trial <- 1 to 6) {
      val ls = List.fill(60)((rnd.nextInt(3).toLong, rnd.nextInt(20).toLong))
        .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val rs = List.fill(60)((rnd.nextInt(3).toLong, rnd.nextInt(20).toLong))
        .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong + 1000) }
      val lDf = ls.toDF("k", "ts", "lid")
      val rDf = rs.toDF("k", "rts", "rid")
      val tol = rnd.nextInt(6).toLong
      // reference: per direction resolve the usual tie rules, then the
      // smaller distance wins, prior winning exact-distance ties
      def want(tolOpt: Option[Long]) = ls.map { case (k, t, lid) =>
        val prior = rs.filter { case (rk, rt, _) =>
          rk == k && rt <= t && tolOpt.forall(tl => t - rt <= tl) }
          .sortBy { case (_, rt, rid) => (rt, rid) }.lastOption
        val next = rs.filter { case (rk, rt, _) =>
          rk == k && rt >= t && tolOpt.forall(tl => rt - t <= tl) }
          .sortBy { case (_, rt, rid) => (rt, rid) }
          .headOption.filter(_ => true)
        val pick = (prior, next) match {
          case (None, n) => n
          case (p, None) => p
          case (Some(p), Some(n)) =>
            if (n._2 - t < t - p._2) Some(n) else Some(p)
        }
        lid -> pick.map(_._3)
      }.toSet
      for (cw <- Seq(None, Some(rnd.nextInt(9) + 1L))) {
        val got = AsOf.joinNearest(lDf, rDf, Seq("k"), "ts", "rts", "rid",
            chunkWidth = cw)
          .select("lid", "rid").as[(Long, Option[Long])].collect().toSet
        assert(got === want(None), s"trial $trial cw=$cw")
        val tolGot = AsOf.joinNearest(lDf, rDf, Seq("k"), "ts", "rts",
            "rid", chunkWidth = cw, tolerance = Some(tol))
          .select("lid", "rid").as[(Long, Option[Long])].collect().toSet
        assert(tolGot === want(Some(tol)), s"trial $trial cw=$cw tol=$tol")
      }
    }
    // both directional picks share ONE hash exchange in the plain plan
    val lDf = Seq((1L, 5L, 1L)).toDF("k", "ts", "lid")
    val rDf = Seq((1L, 3L, 10L), (1L, 6L, 11L)).toDF("k", "rts", "rid")
    val plan = AsOf.joinNearest(lDf, rDf, Seq("k"), "ts", "rts", "rid",
        autoChunk = false)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(
        plan.split("== Initial Plan ==").head).size <= 1,
      s"nearest must not add a second shuffle:\n$plan")
  }

  test("no window frame ends at unboundedfollowing: every pick is a streaming frame") {
    // Spark executes an unbounded-FOLLOWING bound as
    // UnboundedFollowingWindowFunctionFrame — re-scanned per row, O(n²)
    // per key. The forward picks must instead be descending running
    // lasts; pin it for every variant and both plans.
    val lDf = Seq((1L, 5L, 1L)).toDF("k", "ts", "lid")
    val rDf = Seq((1L, 3L, 10L), (1L, 6L, 11L)).toDF("k", "rts", "rid")
    val plans = Seq(
      AsOf.joinFollowing(lDf, rDf, Seq("k"), "ts", "rts", "rid",
        autoChunk = false),
      AsOf.joinFollowing(lDf, rDf, Seq("k"), "ts", "rts", "rid",
        chunkWidth = Some(2L)),
      AsOf.joinNearest(lDf, rDf, Seq("k"), "ts", "rts", "rid",
        autoChunk = false),
      AsOf.joinNearest(lDf, rDf, Seq("k"), "ts", "rts", "rid",
        chunkWidth = Some(2L)))
    plans.foreach { df =>
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("unboundedfollowing"),
        s"quadratic window frame in plan:\n$p")
    }
  }

  test("rejects payload collisions and missing tieBreak") {
    intercept[IllegalArgumentException] {
      AsOf.joinPriorOrEqual(left, right.withColumnRenamed("rid", "lid"),
        Seq("k"), "ts", "rts", "v")
    }
    intercept[IllegalArgumentException] {
      AsOf.joinPriorOrEqual(left, right, Seq("k"), "ts", "rts", "nope")
    }
  }

  test("plan: one hash exchange on the key, no cross product, no broadcast of either side") {
    // autoChunk off: this pins the PLAIN plan shape (the tiny fixture has
    // few distinct keys, so the share-based auto probe would engage)
    val df = AsOf.joinPriorOrEqual(left, right, Seq("k"), "ts", "rts", "rid",
      autoChunk = false)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"pair-blowup join shape:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected union+window shuffle shape:\n$plan")
  }
}
