package graft.operators

import graft.SparkSpec

/** Quantile normalization (L114): the defining equal-distribution
  * property, scale invariance, tie determinism, identity on a single
  * group, hygiene. */
class QuantileNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Double)]) =
    QuantileNormalize.toPooled(rows.toDF("id", "g", "v"),
      "id", "g", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDouble(3)))

  test("equal-size groups map to the IDENTICAL sorted target multiset") {
    // g1 and g2 have wildly different scales; after normalization both
    // carry the same pooled order statistics — the defining property
    val rows = Seq(
      (1L, "g1", 1.0), (2L, "g1", 2.0), (3L, "g1", 3.0),
      (4L, "g2", 100.0), (5L, "g2", 200.0), (6L, "g2", 300.0))
    val out = run(rows)
    val t1 = out.filter(_._2 == "g1").map(_._4).sorted.toSeq
    val t2 = out.filter(_._2 == "g2").map(_._4).sorted.toSeq
    assert(t1 === t2, s"$t1 vs $t2")
    // rank order is preserved within each group
    val g1 = out.filter(_._2 == "g1").sortBy(_._3).map(_._4).toSeq
    assert(g1 === g1.sorted)
  }

  test("a single group maps every value to a pooled order statistic of itself") {
    val vals = Seq(5.0, 1.0, 9.0, 3.0)
    val rows = vals.zipWithIndex.map { case (v, i) => (i.toLong, "g", v) }
    val out = run(rows)
    // n_g = N → idx = r → target is the group's own r-th smallest:
    // the map is the identity on values
    out.foreach { case (_, _, v, t) => assert(t === v) }
  }

  test("ties break by id — deterministic under repartitioning") {
    val rows = Seq(
      (1L, "a", 2.0), (2L, "a", 2.0), (3L, "a", 7.0),
      (4L, "b", 1.0), (5L, "b", 1.0), (6L, "b", 9.0))
    val df = rows.toDF("id", "g", "v")
    val x = QuantileNormalize.toPooled(df, "id", "g", "v")
      .collect().map(_.toSeq).sortBy(_.toString)
    val y = QuantileNormalize.toPooled(df.repartition(7), "id", "g", "v")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(x === y)
  }

  test("null ids, groups and values drop; empty input is refused") {
    val rows = Seq((Option(1L), Option("g"), Option(1.0)),
      (Option.empty[Long], Option("g"), Option(2.0)),
      (Option(3L), Option.empty[String], Option(3.0)),
      (Option(4L), Option("g"), Option.empty[Double]))
      .toDF("id", "g", "v")
    assert(QuantileNormalize.toPooled(rows, "id", "g", "v").count() === 1L)
    val e = intercept[IllegalArgumentException] {
      QuantileNormalize.toPooled(
        Seq.empty[(Long, String, Double)].toDF("id", "g", "v"),
        "id", "g", "v")
    }
    assert(e.getMessage.contains("empty input"))
  }
}
