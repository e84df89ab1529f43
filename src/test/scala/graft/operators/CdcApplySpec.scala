package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CDC changelog compaction + apply (L102). Pins every merge outcome
  * class by hand, the latest-wins compaction over multi-version keys,
  * null hygiene, and agreement with a plain-Scala fold of the same
  * changelog. */
class CdcApplySpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L)
  ).toDF("k", "s", "v")

  // key 1: untouched; key 2: one update; key 3: update then delete;
  // key 4: delete then (later seq) re-insert; key 5: pure insert;
  // key 6: insert then delete — never surfaces
  private def chg = Seq(
    (2L, 10L, "U", "b2", 21L),
    (3L, 10L, "U", "c2", 31L), (3L, 11L, "D", null, 0L),
    (4L, 10L, "D", null, 0L), (4L, 11L, "I", "d2", 42L),
    (5L, 10L, "I", "e", 50L),
    (6L, 10L, "I", "f", 60L), (6L, 11L, "D", null, 0L)
  ).toDF("k", "seq", "op", "s", "v")

  test("every merge outcome class") {
    val out = CdcApply(base, chg, "k", "seq", "op", Seq("s", "v"))
      .orderBy("k").collect().toSeq
    assert(out === Seq(
      Row(1L, "a", 10L, null, null),        // base-only pass-through
      Row(2L, "b2", 21L, 10L, "U"),          // single update
      // key 3 deleted (U then D compacts to D)
      Row(4L, "d2", 42L, 11L, "I"),          // delete then re-insert
      Row(5L, "e", 50L, 10L, "I")            // plain insert
      // key 6 insert-then-delete never surfaces
    ))
  }

  test("upsert: an update to a key absent from the base inserts it") {
    val out = CdcApply(base.filter($"k" =!= 2L), chg, "k", "seq", "op",
        Seq("s", "v"))
      .filter($"k" === 2L).collect().toSeq
    assert(out === Seq(Row(2L, "b2", 21L, 10L, "U")))
  }

  test("null keys and null seqs are dropped, not merged") {
    val dirtyChg = chg.unionAll(Seq(
      (Option.empty[Long], Option(12L), "U", "x", 1L),
      (Option(1L), Option.empty[Long], "U", "y", 2L)
    ).toDF("k", "seq", "op", "s", "v"))
    val dirtyBase = base.unionAll(
      Seq((Option.empty[Long], "z", 99L)).toDF("k", "s", "v"))
    val out = CdcApply(dirtyBase, dirtyChg, "k", "seq", "op", Seq("s", "v"))
      .orderBy("k").collect().toSeq
    val clean = CdcApply(base, chg, "k", "seq", "op", Seq("s", "v"))
      .orderBy("k").collect().toSeq
    assert(out === clean) // key 1 keeps its base image: the null-seq U is dropped
  }

  test("a null latest op is dropped, not treated as a delete (ADVICE r11)") {
    // key 1's only changelog row has op = NULL at the HIGHEST seq: if
    // compact kept it, `op =!= deleteOp` would go NULL and the filter
    // would silently delete key 1 — the malformed row must instead be
    // dropped so the base image rides through untouched
    val dirtyChg = chg.unionAll(Seq(
      (Option(1L), Option(99L), Option.empty[String], Option("x"), Option(1L))
    ).toDF("k", "seq", "op", "s", "v"))
    val out = CdcApply(base, dirtyChg, "k", "seq", "op", Seq("s", "v"))
      .orderBy("k").collect().toSeq
    val clean = CdcApply(base, chg, "k", "seq", "op", Seq("s", "v"))
      .orderBy("k").collect().toSeq
    assert(out === clean)
    assert(out.exists(r => r.getLong(0) == 1L)) // key 1 survives
  }

  test("matches a plain-Scala latest-wins fold on a randomized batch") {
    val rnd = new scala.util.Random(42)
    val baseRows = (1L to 50L).map(k => (k, s"s$k", k * 10))
    val chgRows = (1 to 300).map { i =>
      val k = rnd.nextInt(70).toLong + 1
      val op = rnd.nextInt(3) match {
        case 0 => "I"; case 1 => "U"; case 2 => "D"
      }
      (k, i.toLong, op, s"c$i", i.toLong * 100)
    }
    val out = CdcApply(baseRows.toDF("k", "s", "v"),
        chgRows.toDF("k", "seq", "op", "s", "v"),
        "k", "seq", "op", Seq("s", "v"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2))).toMap
    // reference: latest change per key, latest-wins over the base map
    val latest = chgRows.groupBy(_._1).map { case (k, rs) =>
      k -> rs.maxBy(_._2)
    }
    val expected = (baseRows.map(r => r._1 -> (r._2, r._3)).toMap.keySet ++
        latest.keySet).flatMap { k =>
      latest.get(k) match {
        case Some((_, _, "D", _, _)) => None
        case Some((_, _, _, s, v))   => Some(k -> (s, v))
        case None => baseRows.find(_._1 == k).map(r => k -> (r._2, r._3))
      }
    }.toMap
    assert(out === expected)
  }

  test("reserved-name guard: a value column named 'seq' is rejected") {
    // the Reserved.guard class fix — one representative test; every
    // new r11 operator with fixed output names carries the same guard
    val bad = Seq((1L, 2L, "U", 3L)).toDF("k", "seqno", "op2", "seq")
    val e = intercept[IllegalArgumentException] {
      CdcApply(base, bad, "k", "seqno", "op2", Seq("seq"))
    }
    assert(e.getMessage.contains("reserves column name"))
  }

  test("compaction plan is a struct-max aggregate, not a window") {
    val plan = CdcApply(base, chg, "k", "seq", "op", Seq("s", "v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "latest-per-key must not use a window")
  }
}
