package graft.operators

import graft.SparkSpec

class MatryoshkaSpec extends SparkSpec {
  import spark.implicits._

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
    if (na == 0 || nb == 0) 0.0
    else BigDecimal(dot / (na * nb))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private def refTopK(qs: Seq[(Long, Seq[Float])],
      cs: Seq[(Long, Seq[Float])], k: Int): Map[Long, Seq[Long]] =
    qs.map { case (qid, qv) =>
      qid -> cs.map { case (nid, nv) => (nid, cos(qv, nv)) }
        .sortBy(r => (-r._2, r._1)).take(k).map(_._1)
    }.toMap

  private def reference(qs: Seq[(Long, Seq[Float])],
      cs: Seq[(Long, Seq[Float])], k: Int, dims: Seq[Int]) = {
    val full = refTopK(qs, cs, k)
    dims.flatMap { d =>
      val cut = refTopK(qs.map { case (i, v) => (i, v.take(d)) },
        cs.map { case (i, v) => (i, v.take(d)) }, k)
      qs.map { case (qid, _) =>
        (d, qid, cut(qid).count(full(qid).toSet).toLong)
      }
    }.sortBy(r => (r._1, r._2))
  }

  private def run(qs: Seq[(Long, Seq[Float])],
      cs: Seq[(Long, Seq[Float])], k: Int, dims: Seq[Int]) =
    Similarity.matryoshkaAudit(qs.toDF("vec_id", "embedding"),
        cs.toDF("vec_id", "embedding"), k, dims)
      .as[(Int, Long, Long)].collect().toSeq.sortBy(r => (r._1, r._2))

  test("hand case: prefix dims reorder neighbors; full-width overlap is k") {
    // query along dim0; on the 2-dim prefix neighbors 10 and 11 TIE at
    // cos 1 and the id tie-break picks 10, but 10's tail junk drops it
    // in the full ranking, where 11 wins
    val q = Seq(0L -> Seq(1f, 0f, 0f, 0f))
    val c = Seq(
      10L -> Seq(1f, 0f, -1f, 1f),
      11L -> Seq(0.8f, 0f, 0f, 0f),
      12L -> Seq(0f, 1f, 0f, 0f))
    val got = run(q, c, k = 1, dims = Seq(2, 4))
    assert(got === reference(q, c, 1, Seq(2, 4)))
    // sanity the fixture does what the comment says
    assert(got.find(_._1 == 2).get._3 === 0L) // prefix-1 pick differs
    assert(got.find(_._1 == 4).get._3 === 1L) // full width == full ranking
  }

  test("zero-overlap queries still report 0 (the finding, not a dropout)") {
    val q = Seq(0L -> Seq(0f, 1f))
    val c = Seq(10L -> Seq(1f, 0f), 11L -> Seq(1f, 1f))
    // prefix dim 1: q truncates to [0] (zero norm → sim 0 everywhere,
    // ties to smaller id = 10); full: 11 wins — overlap 0 at k=1
    val got = run(q, c, k = 1, dims = Seq(1))
    assert(got === Seq((1, 0L, 0L)))
  }

  test("property: engine matches the reference on seeded vectors") {
    val rnd = new scala.util.Random(59)
    val mk = (n: Int, off: Long) => (0 until n).map(i =>
      (off + i) -> Seq.fill(16)((rnd.nextInt(9) - 4).toFloat / 4f))
    val qs = mk(8, 0L)
    val cs = mk(60, 100L)
    assert(run(qs, cs, k = 4, dims = Seq(2, 4, 8, 16)) ===
      reference(qs, cs, 4, Seq(2, 4, 8, 16)))
  }
}
