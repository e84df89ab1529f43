package graft.operators

import graft.SparkSpec

class RrfSpec extends SparkSpec {
  import spark.implicits._

  // driver reference: the textbook RRF sum with the same 1e6 floor
  private def reference(a: Seq[Long], b: Seq[Long], k0: Int) = {
    val ra = a.zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    val rb = b.zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    (a ++ b).distinct.map { id =>
      val s = ra.get(id).map(r => math.floor(1e6 / (k0 + r)).toLong)
        .getOrElse(0L) +
        rb.get(id).map(r => math.floor(1e6 / (k0 + r)).toLong).getOrElse(0L)
      (id, ra.getOrElse(id, 0L), rb.getOrElse(id, 0L), s)
    }.sortBy { case (id, _, _, s) => (-s, id) }
      .zipWithIndex
      .map { case ((id, r1, r2, s), i) => (id, r1, r2, s, i + 1) }
  }

  private def run(a: Seq[Long], b: Seq[Long], k0: Int = 60) = {
    val fa = a.zipWithIndex.map { case (id, i) => (id, i + 1L) }
      .toDF("doc_id", "rank")
    val fb = b.zipWithIndex.map { case (id, i) => (id, i + 1L) }
      .toDF("doc_id", "rank")
    Rrf.fuseTwo(fa, fb, "doc_id", k0)
      .as[(Long, Long, Long, Long, Int)].collect().toSeq.sortBy(_._5)
  }

  test("hand case: overlap outranks either single-list head") {
    // doc 30 is mid-ranked in BOTH lists; doc 10/20 head one list each.
    // 1e6/(60+2)+1e6/(60+3) = 16129+15873 = 32002 beats 1e6/61 = 16393.
    val got = run(Seq(10L, 30L, 40L), Seq(20L, 50L, 30L))
    assert(got.head._1 === 30L)
    assert(got.head._4 === 32002L)
    assert(got === reference(Seq(10L, 30L, 40L), Seq(20L, 50L, 30L), 60))
  }

  test("disjoint lists: same-rank docs tie and break to the smaller id") {
    val got = run(Seq(7L, 9L), Seq(8L, 6L))
    // ranks 1: docs 7 and 8 tie at 16393; rank order 7 < 8
    assert(got.map(_._1) === Seq(7L, 8L, 6L, 9L))
    assert(got === reference(Seq(7L, 9L), Seq(8L, 6L), 60))
  }

  test("property: engine matches the reference on seeded overlapping pages") {
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 5) {
      val ids = rnd.shuffle((1L to 60L).toList)
      val a = ids.take(20)
      val b = rnd.shuffle(ids.drop(10)).take(20)
      assert(run(a, b) === reference(a, b, 60), s"trial $trial")
    }
  }

  test("absent ranks surface as 0 and contribute nothing") {
    val got = run(Seq(1L), Seq(2L))
    assert(got.find(_._1 == 1L).get._3 === 0L)
    assert(got.find(_._1 == 2L).get._2 === 0L)
    assert(got.find(_._1 == 1L).get._4 === 16393L)
  }

  test("guard: k0 must be positive") {
    intercept[IllegalArgumentException] {
      Rrf.fuseTwo(Seq((1L, 1L)).toDF("doc_id", "rank"),
        Seq((1L, 1L)).toDF("doc_id", "rank"), "doc_id", k0 = 0)
    }
  }
}
