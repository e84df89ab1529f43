package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextAnalysis

/** Zipf rank-frequency slope (L106): exact −1 on a perfect power law,
  * plain-Scala OLS parity, degenerate-rank NULL, tie-break and
  * partitioning determinism, topRanks truncation. */
class ZipfSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(counts: Map[String, Int], src: String = "s1") =
    Seq((src, counts.toSeq.sortBy(_._1)
      .flatMap { case (t, n) => Seq.fill(n)(t) }.mkString(" ")))
      .toDF("source", "text")

  private def slope(counts: Map[String, Int], topRanks: Int = 100) =
    Zipf.slopeByGroup(docsOf(counts), "text", "source",
        TextAnalysis.tokens, topRanks)
      .collect().map(r => (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).head

  test("perfect 1/rank law fits slope -1") {
    // freq = 12/rank exactly at ranks 1..4
    val (m, s) = slope(Map("a" -> 12, "b" -> 6, "c" -> 4, "d" -> 3))
    assert(m === 4L)
    assert(math.abs(s.get + 1.0) < 1e-4, s"slope ${s.get} should be ~-1")
  }

  test("single-rank vocabulary yields NULL slope, not a crash") {
    val (m, s) = slope(Map("only" -> 7))
    assert(m === 1L && s.isEmpty)
  }

  test("matches a plain-Scala OLS reference on a random vocabulary") {
    val rnd = new scala.util.Random(3)
    val counts = (1 to 40).map(i => s"tok$i" -> (rnd.nextInt(50) + 1)).toMap
    val (m, s) = slope(counts)
    // reference: identical quantization and OLS
    val ranked = counts.toSeq.sortBy { case (t, n) => (-n, t) }
      .zipWithIndex.map { case ((_, n), i) => (i + 1, n) }
    val pts = ranked.map { case (r, n) =>
      (math.floor(math.log(r.toDouble) * 1e6 + 0.5).toLong,
        math.floor(math.log(n.toDouble) * 1e6 + 0.5).toLong)
    }
    val mm = pts.size.toLong
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val expected = BigDecimal((mm * sxy - sx * sy).toDouble /
        (mm * sxx - sx * sx).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m === mm)
    assert(math.abs(s.get - expected) < 1e-9, s"${s.get} vs $expected")
  }

  test("topRanks truncates the tail") {
    val counts = (1 to 30).map(i => s"t$i" -> (31 - i)).toMap
    val (m, _) = slope(counts, topRanks = 10)
    assert(m === 10L)
  }

  test("deterministic under repartitioning with tied counts") {
    val docs = docsOf((1 to 20).map(i => s"t$i" -> 5).toMap)
    val a = Zipf.slopeByGroup(docs, "text", "source",
      TextAnalysis.tokens).collect().toSeq
    val b = Zipf.slopeByGroup(docs.repartition(8), "text", "source",
      TextAnalysis.tokens).collect().toSeq
    assert(a === b)
    // all-tied counts: y constant, x varies → slope exactly 0
    assert(a.head.getDouble(2) === 0.0)
  }
}
