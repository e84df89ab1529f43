package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextAnalysis

/** UniMax waterfilling (L116): hand-computed level + remainder,
  * the surplus-budget degenerate case, the Σ-invariant, monotonicity,
  * and partitioning determinism. */
class UniMaxSpec extends SparkSpec {
  import spark.implicits._

  private def corpusOf(avail: Map[String, Int]) =
    avail.toSeq.map { case (s, n) => (s, Seq.fill(n)("w").mkString(" ")) }
      .toDF("source", "text")

  private def alloc(avail: Map[String, Int], num: Long, den: Long,
      epochs: Int = 1) =
    UniMax.allocate(corpusOf(avail), "source",
        TextAnalysis.tokenCount(col("text")), num, den, epochs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

  test("hand waterfill: cap prefix, level, remainder to smallest uncapped") {
    // avail [a:2, b:4, c:10, d:10], epochs 1, N = 26/2 = 13:
    // a capped (2); level (13-2) DIV 3 = 3, remainder 2 → b gets 4
    // (its cap), c gets 4, d gets 3
    val m = alloc(Map("a" -> 2, "b" -> 4, "c" -> 10, "d" -> 10), 1, 2)
    assert(m("a")._3 === 2L && m("b")._3 === 4L)
    assert(m("c")._3 === 4L && m("d")._3 === 3L)
    assert(m.values.map(_._3).sum === 13L)
  }

  test("budget above total capacity degenerates to alloc = cap") {
    val m = alloc(Map("a" -> 3, "b" -> 7), 5, 1, epochs = 2)
    m.foreach { case (_, (av, cap, al)) =>
      assert(cap === av * 2 && al === cap)
    }
  }

  test("sum invariant: allocations spend min(N, total capacity) exactly") {
    val rnd = new scala.util.Random(41)
    for (_ <- 1 to 4) {
      val avail = (1 to 12).map(i => s"s$i" -> (rnd.nextInt(40) + 1)).toMap
      val m = alloc(avail, 7, 4, epochs = 2)
      val total = avail.values.map(_.toLong).sum
      val n = total * 7 / 4
      val capTotal = total * 2
      assert(m.values.map(_._3).sum === math.min(n, capTotal))
      // nobody exceeds their cap; allocation monotone in cap UP TO the
      // remainder unit (the +1s go to the SMALLEST uncapped caps, so a
      // smaller source can sit exactly one token above a larger one)
      m.foreach { case (_, (_, cap, al)) => assert(al <= cap) }
      val sorted = m.values.toSeq.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Seq((_, _, a1), (_, _, a2)) => assert(a1 <= a2 + 1)
        case _ =>
      }
    }
  }

  test("deterministic under repartitioning") {
    val avail = (1 to 10).map(i => s"s$i" -> (i * 3)).toMap
    val df = corpusOf(avail)
    val a = UniMax.allocate(df, "source",
        TextAnalysis.tokenCount(col("text")), 3, 2, 2)
      .collect().map(_.toSeq).sortBy(_.toString)
    val b = UniMax.allocate(df.repartition(6), "source",
        TextAnalysis.tokenCount(col("text")), 3, 2, 2)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a === b)
  }
}
