package graft.operators

import graft.SparkSpec

class HardNegativesSpec extends SparkSpec {
  import spark.implicits._

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
    if (na == 0 || nb == 0) 0.0
    else BigDecimal(dot / (na * nb))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private def reference(queries: Seq[(Long, Seq[Float])],
      corpus: Seq[(Long, Seq[Float])], thr: Double) =
    queries.flatMap { case (qid, qv) =>
      val scored = corpus.filter(_._1 != qid)
        .map { case (nid, nv) => (nid, cos(qv, nv)) }
      val pos = scored.filter(_._2 >= thr).sortBy(r => (-r._2, r._1))
        .headOption
      val neg = scored.filter(_._2 < thr).sortBy(r => (-r._2, r._1))
        .headOption
      for (p <- pos; n <- neg)
        yield (qid, p._1, p._2, n._1, n._2)
    }.sortBy(_._1)

  private def run(queries: Seq[(Long, Seq[Float])],
      corpus: Seq[(Long, Seq[Float])], thr: Double) =
    Similarity.hardNegatives(queries.toDF("vec_id", "embedding"),
        corpus.toDF("vec_id", "embedding"), thr)
      .as[(Long, Long, Double, Long, Double)].collect().toSeq.sortBy(_._1)

  test("hand case: nearest duplicate is the positive, nearest non-dup the negative") {
    // anchor 0 along x; 1 = near-identical (pos), 2 = confusable at
    // ~0.71 (hard neg), 3 = orthogonal (easy neg, must NOT be picked)
    val vs = Seq(
      0L -> Seq(1f, 0f, 0f),
      1L -> Seq(0.99f, 0.1f, 0f),
      2L -> Seq(1f, 1f, 0f),
      3L -> Seq(0f, 0f, 1f))
    val got = run(vs.take(1), vs, thr = 0.9)
    assert(got.size === 1)
    val (qid, posId, posSim, negId, negSim) = got.head
    assert(qid === 0L && posId === 1L && negId === 2L)
    assert(posSim >= 0.9 && negSim < 0.9 && negSim > 0.7)
    assert(got === reference(vs.take(1), vs, 0.9))
  }

  test("anchors missing either leg drop (triplet needs all three)") {
    // two orthogonal vectors: no positive exists at thr 0.9 → empty
    val vs = Seq(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f))
    assert(run(vs.take(1), vs, 0.9).isEmpty)
    // identical twins only: no NEGATIVE exists → empty
    val twins = Seq(0L -> Seq(1f, 0f), 1L -> Seq(1f, 0f))
    assert(run(twins.take(1), twins, 0.9).isEmpty)
  }

  test("property: engine matches the reference on seeded vectors (ties included)") {
    val rnd = new scala.util.Random(37)
    val vecs = (0L until 40L).map { id =>
      id -> Seq.fill(8)((rnd.nextInt(5) - 2).toFloat / 2f)
    }
    assert(run(vecs.take(10), vecs, 0.45) ===
      reference(vecs.take(10), vecs, 0.45))
  }
}
