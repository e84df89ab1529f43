package graft.operators

import graft.SparkSpec

class GroupedQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Double)], ps: Seq[Long]) =
    MedianImpute.groupedQuantiles(rows.toDF("g", "v"), "g", "v", ps)
      .as[(String, Long, Double)].collect().toSeq
      .sortBy(r => (r._1, r._2))

  test("hand case: min / lower-median / max per group") {
    val rows = Seq("a" -> 4.0, "a" -> 1.0, "a" -> 3.0, "a" -> 2.0,
      "b" -> 10.0)
    val got = run(rows, Seq(0L, 500000L, 1000000L))
    // n=4: p50 rank = floor(0.5*3) = 1 -> value 2 (lower median)
    assert(got === Seq(
      ("a", 0L, 1.0), ("a", 500000L, 2.0), ("a", 1000000L, 4.0),
      ("b", 0L, 10.0), ("b", 500000L, 10.0), ("b", 1000000L, 10.0)))
  }

  test("property: equals the sorted-rank reference; duplicates safe (seeded)") {
    val rnd = new scala.util.Random(71)
    val rows = (1 to 600).map { _ =>
      (s"g${rnd.nextInt(5)}", rnd.nextInt(40).toDouble) // many ties
    }
    val ps = Seq(100000L, 250000L, 500000L, 900000L, 990000L)
    val got = run(rows, ps)
    val want = rows.groupBy(_._1).toSeq.flatMap { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      ps.map(p => (g, p, sorted((p * (sorted.size - 1) / 1000000L).toInt)))
    }.sortBy(r => (r._1, r._2))
    assert(got === want)
  }

  test("null groups and values dropped; guards") {
    val df = Seq((Some("a"), Some(1.0)), (Some("a"), None),
      (None, Some(2.0))).toDF("g", "v")
    val got = MedianImpute.groupedQuantiles(df, "g", "v", Seq(500000L))
      .as[(String, Long, Double)].collect().toSeq
    assert(got === Seq(("a", 500000L, 1.0)))
    intercept[IllegalArgumentException] {
      MedianImpute.groupedQuantiles(df, "g", "v", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      MedianImpute.groupedQuantiles(df, "g", "v", Seq(1000001L))
    }
  }
}
