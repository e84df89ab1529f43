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
    val plain = AsOf.joinPriorOrEqual(lDf, rDf, Seq("k"), "ts", "rts", "rid")
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
    val df = AsOf.joinPriorOrEqual(left, right, Seq("k"), "ts", "rts", "rid")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"pair-blowup join shape:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected union+window shuffle shape:\n$plan")
  }
}
