package graft.operators

import graft.SparkSpec

/** L173 average precision + max-F1 (r15): hand-worked cascade values,
  * the perfect/inverted/degenerate landmarks, the higher-threshold
  * tie-break, and a seeded plain-Scala replay. */
class PrCurveSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long)]) = {
    val r = PrCurve.averagePrecision(
      rows.map(p => ("g", p._1, p._2)).toDF("g", "y", "v"),
      "g", "y", "v").collect().head
    (r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getLong(3)),
      if (r.isNullAt(4)) None else Some(r.getLong(4)),
      if (r.isNullAt(5)) None else Some(r.getLong(5)))
  }

  test("hand-worked 4-item curve: term cascade and argmax land exactly") {
    // (3,+)(3,−)(2,+)(1,−): terms 5e8 + 666666666, AP = 583333333;
    // f1 walk 500000 / 800000 / 666666 → best (800000, thr 2)
    val (np, nn, ap, thr, f1) =
      run(Seq((1L, 3L), (0L, 3L), (1L, 2L), (0L, 1L)))
    assert((np, nn) === ((2L, 2L)))
    assert(ap === Some(583333333L))
    assert(thr === Some(2L) && f1 === Some(800000L))
  }

  test("perfect ranking: AP exactly 1e9, F1 exactly 1e6") {
    val (_, _, ap, thr, f1) =
      run(Seq((1L, 10L), (1L, 9L), (0L, 5L), (0L, 4L)))
    assert(ap === Some(1000000000L))
    assert(thr === Some(9L) && f1 === Some(1000000L))
  }

  test("inverted ranking: AP below the random baseline") {
    // pos at the bottom: AP = (1/3 + 1/2)·1e9/2 = 416666666
    val (_, _, ap, _, _) =
      run(Seq((1L, 1L), (1L, 2L), (0L, 9L), (0L, 8L)))
    assert(ap === Some(416666666L))
  }

  test("no positives: NULL AP and operating point, never a fake zero") {
    val (np, _, ap, thr, f1) = run(Seq((0L, 5L), (0L, 3L)))
    assert(np === 0L && ap === None && thr === None && f1 === None)
  }

  test("no negatives: every precision is 1 — AP exactly 1e9 (defined)") {
    val (_, nn, ap, _, _) = run(Seq((1L, 5L), (1L, 3L)))
    assert(nn === 0L && ap === Some(1000000000L))
  }

  test("F1 tie breaks toward the HIGHER threshold") {
    // v=5: tp=1, n=2 → f1 = 2/4; v=4: tp=2, n=6 → f1 = 4/8 — equal;
    // the max-struct pick must choose thr 5
    val rows = Seq((1L, 5L), (0L, 5L), (1L, 4L), (0L, 4L), (0L, 4L),
      (0L, 4L))
    val (_, _, _, thr, f1) = run(rows)
    assert(f1 === Some(500000L) && thr === Some(5L))
  }

  test("seeded replay: cascade matches the plain-Scala mirror") {
    val rnd = new scala.util.Random(1527)
    val rows = Seq.fill(800) {
      val v = rnd.nextInt(50).toLong
      // label correlated with score so AP > prevalence
      ((if (rnd.nextInt(100) < 20 + v) 1L else 0L), v)
    }
    val (np, nn, ap, thr, f1) = run(rows)
    // mirror
    val grid = rows.groupBy(_._2).map { case (v, g) =>
      (v, g.count(_._1 == 1L).toLong, g.size.toLong) }
      .toSeq.sortBy(-_._1)
    val nPos = grid.map(_._2).sum
    var tp = 0L; var n = 0L
    var sterm = BigInt(0); var best = (Long.MinValue, Long.MinValue)
    grid.foreach { case (v, pos, tot) =>
      tp += pos; n += tot
      sterm += BigInt(1000000000L) * pos * tp / n
      val f = BigInt(2000000L) * tp / (n + nPos)
      if (f.toLong > best._1 || (f.toLong == best._1 && v > best._2))
        best = (f.toLong, v)
    }
    assert(np === nPos && nn === grid.map(t => t._3 - t._2).sum)
    assert(ap === Some((sterm / nPos).toLong))
    assert(f1 === Some(best._1) && thr === Some(best._2))
  }
}
