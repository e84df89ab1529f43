package graft.operators

import org.apache.spark.sql.Row

import graft.SparkSpec

/** Adamic–Adar link prediction (L104): hand-computed path/triangle
  * fixture, adjacency exclusion, degree-1 totality, and a randomized
  * graph against a plain-Scala reference. */
class LinkPredictSpec extends SparkSpec {
  import spark.implicits._

  private def w(d: Int): Long =
    math.floor(1000000.0 / math.log(d.toDouble) + 0.5).toLong

  test("hand fixture: triangle + tail") {
    // 1-2, 1-3, 2-3 (triangle), 3-4, 4-5 (tail)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val out = LinkPredict.adamicAdar(edges, "a", "b")
      .orderBy("a", "b").collect().toSeq
    // deg: 1→2, 2→2, 3→3, 4→2, 5→1
    assert(out === Seq(
      Row(1L, 4L, 1L, w(3)),  // share 3
      Row(2L, 4L, 1L, w(3)),  // share 3
      Row(3L, 5L, 1L, w(2))   // share 4
    ))
    // adjacent pairs (1,2),(1,3),(2,3),(3,4),(4,5) never appear
    assert(!out.exists(r => (r.getLong(0), r.getLong(1)) == (1L, 2L)))
  }

  test("degree-1 vertices never divide by ln(1)=0") {
    // a star center with one leaf each: every leaf has degree 1
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val out = LinkPredict.adamicAdar(edges, "a", "b")
      .orderBy("a", "b").collect().toSeq
    // leaves pair through the center (deg 3)
    assert(out === Seq(
      Row(2L, 3L, 1L, w(3)), Row(2L, 4L, 1L, w(3)), Row(3L, 4L, 1L, w(3))))
  }

  test("matches a plain-Scala reference on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 120).map { _ =>
      val a = rnd.nextInt(30).toLong; val b = rnd.nextInt(30).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    val out = LinkPredict.adamicAdar(edges.toDF("a", "b"), "a", "b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val adj = (edges ++ edges.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val eset = edges.toSet
    val expected = (for {
      (a, na) <- adj.toSeq; (b, nb) <- adj.toSeq if a < b
      if !eset.contains((a, b))
      shared = na.intersect(nb) if shared.nonEmpty
    } yield (a, b) ->
      (shared.size.toLong, shared.toSeq.map(z => w(adj(z).size)).sum)).toMap
    assert(out === expected)
  }
}
