package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], minRun: Int) =
    ExactSubstr.dedupSubstrings(docs.toDF("doc_id", "text"), "doc_id",
        "text", minRun)
      .orderBy(col("id"))
      .as[(Long, Long, Long, String)].collect().toSeq

  test("cross-doc duplicated run removed from the non-canonical doc only") {
    val got = run(Seq(
      (1L, "a b c d e f g h"),
      (2L, "x y a b c d e z")), minRun = 4)
    // doc 1 holds the min-(id,pos) winner of every duplicated gram →
    // untouched; doc 2 loses the 5-token shared run "a b c d e"
    assert(got(0) === ((1L, 8L, 0L, "a b c d e f g h")))
    assert(got(1) === ((2L, 8L, 5L, "x y z")))
  }

  test("within-doc repetition loses its second occurrence") {
    val got = run(Seq((3L, "p q r s p q r s")), minRun = 4)
    assert(got === Seq((3L, 8L, 4L, "p q r s")))
  }

  test("null ids are dropped and null text surfaces as an empty doc") {
    // ADVICE r9: null doc_ids must not collapse into one rebuild group,
    // and null text must yield (0, 0, "") — not null counters
    val docs = Seq(
      (java.lang.Long.valueOf(1L), "a b c d e"),
      (null.asInstanceOf[java.lang.Long], "ghost row"),
      (java.lang.Long.valueOf(2L), null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = ExactSubstr.dedupSubstrings(docs, "doc_id", "text", 4)
      .orderBy(col("id")).as[(Long, Long, Long, String)].collect().toSeq
    assert(got === Seq((1L, 5L, 0L, "a b c d e"), (2L, 0L, 0L, "")))
  }

  test("short, empty and fully-duplicated documents") {
    val got = run(Seq(
      (1L, "a b c d e f g h"),
      (4L, "u v"),          // shorter than minRun: passes through whole
      (5L, ""),             // empty
      (6L, "a b c d")),     // exactly a duplicated run → fully removed
      minRun = 4)
    assert(got(1) === ((4L, 2L, 0L, "u v")))
    assert(got(2) === ((5L, 0L, 0L, "")))
    assert(got(3) === ((6L, 4L, 4L, "")))
  }

  test("overlapping duplications compose by union") {
    // doc 8 loses "a b c d" to doc 5 and "c d e f" to doc 6 (both
    // smaller ids win); its covered intervals [0,4) and [2,6) union to
    // [0,6)
    val got = run(Seq(
      (5L, "a b c d q r s t"),
      (6L, "z1 z2 c d e f z3 z4"),
      (8L, "a b c d e f w w2")), minRun = 4)
    assert(got(2)._3 === 6L)
    assert(got(2)._4 === "w w2")
    // the winners keep everything
    assert(got(0)._3 === 0L)
    assert(got(1)._3 === 0L)
  }

  test("an all-unique corpus round-trips byte-identically") {
    val docs = (1 to 30).map(i =>
      (i.toLong, (0 until 12).map(j => s"t${i}_$j").mkString(" ")))
    val got = run(docs, minRun = 4)
    assert(got.forall(_._3 == 0L))
    assert(got.map(g => g._1 -> g._4).toMap === docs.toMap)
  }

  test("brute-force coverage agreement on a seeded corpus") {
    // independent per-doc reimplementation: mark tokens covered by any
    // non-winner duplicated window, computed with plain Scala maps
    val rnd = new scala.util.Random(99)
    val vocab = Vector("a", "b", "c", "d", "e")
    val docs = (1L to 40L).map(i =>
      i -> (0 until (6 + rnd.nextInt(10))).map(_ => vocab(rnd.nextInt(5)))
        .mkString(" "))
    val k = 4
    val grams = docs.flatMap { case (id, t) =>
      val tk = t.split(" ")
      if (tk.length < k) Seq.empty
      else (0 to tk.length - k).map(p => (tk.slice(p, p + k).mkString(" "), id, p))
    }
    val winners = grams.groupBy(_._1).collect {
      case (g, occ) if occ.size >= 2 => g -> occ.map(o => (o._2, o._3)).min
    }
    val covered = grams.collect {
      case (g, id, p) if winners.contains(g) && winners(g) != ((id, p)) =>
        (id, p)
    }.flatMap { case (id, p) => (p until p + k).map(tp => (id, tp)) }.toSet
    val expect = docs.map { case (id, t) =>
      val tk = t.split(" ").zipWithIndex
      val kept = tk.collect { case (tok, tp) if !covered((id, tp)) => tok }
      (id, tk.length.toLong, (tk.length - kept.length).toLong,
        kept.mkString(" "))
    }
    assert(run(docs, k) === expect)
  }
}
