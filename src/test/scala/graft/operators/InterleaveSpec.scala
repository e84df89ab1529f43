package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

class InterleaveSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Definitional reference: sort all docs by (v, source, r) with v
    * compared as exact rationals via cross-multiplication. */
  private def reference(docs: Seq[(Long, String)],
      w: Map[String, Long]): Map[Long, (Long, Long)] = {
    val ranked = docs.groupBy(_._2).flatMap { case (s, ds) =>
      ds.sortBy(d => (md5hex(d._1.toString), d._1)).zipWithIndex
        .map { case ((id, _), r) => (id, s, r.toLong) }
    }.toSeq
    val ordered = ranked.sortWith { case ((_, s1, r1), (_, s2, r2)) =>
      val lhs = (r1 + 1) * w(s2); val rhs = (r2 + 1) * w(s1)
      if (lhs != rhs) lhs < rhs
      else if (s1 != s2) s1 < s2
      else r1 < r2
    }
    ordered.zipWithIndex.map { case ((id, _, r), p) =>
      id -> ((r, p.toLong))
    }.toMap
  }

  private def run(docs: Seq[(Long, String)], w: Map[String, Long]) = {
    val weightOf = w.foldLeft(lit(null).cast("long")) { case (acc, (s, wv)) =>
      when(col("source") === s, lit(wv)).otherwise(acc)
    }
    Interleave.positions(docs.toDF("doc_id", "source"), "source",
        "doc_id", weightOf)
      .select(col("doc_id"), col("r"), col("pos"))
      .as[(Long, Long, Long)].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap
  }

  test("positions are a permutation matching the definitional sort") {
    val rnd = new scala.util.Random(5)
    val srcs = Vector("a", "b", "c")
    val docs = (1L to 200L).map(i => i -> srcs(rnd.nextInt(3)))
    val w = Map("a" -> 3L, "b" -> 2L, "c" -> 1L)
    val got = run(docs, w)
    assert(got.values.map(_._2).toSeq.sorted === (0L until 200L))
    assert(got === reference(docs, w))
  }

  test("equal weights degenerate to round-robin-ish fair order") {
    val docs = (1L to 60L).map(i => i -> (if (i % 2 == 0) "x" else "y"))
    val got = run(docs, Map("x" -> 1L, "y" -> 1L))
    assert(got === reference(docs, Map("x" -> 1L, "y" -> 1L)))
    // fairness: among any first 2k positions, k from each source
    val bySrc = docs.toMap
    val atPos = got.toSeq.map { case (id, (_, p)) => p -> bySrc(id) }.toMap
    (1 to 30).foreach { k =>
      val firstTwoK = (0L until 2L * k).map(atPos)
      assert(firstTwoK.count(_ == "x") === k, s"prefix ${2 * k}")
    }
  }

  test("a 3:1 weight emits three of the heavy source per light one") {
    val docs = (1L to 40L).map(i => i -> (if (i <= 30) "h" else "l"))
    val w = Map("h" -> 3L, "l" -> 1L)
    val got = run(docs, w)
    assert(got === reference(docs, w))
    val bySrc = docs.toMap
    val order = got.toSeq.sortBy(_._2._2).map { case (id, _) => bySrc(id) }
    // each block of 4 (while both sources last) carries exactly one 'l'
    order.take(40).grouped(4).take(7).foreach { blk =>
      assert(blk.count(_ == "l") === 1, blk.mkString(","))
    }
  }

  test("non-constant and non-positive weights are rejected") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "source")
    intercept[IllegalArgumentException] {
      Interleave.positions(docs, "source", "doc_id",
        when(col("doc_id") === 1, lit(2L)).otherwise(lit(1L)))
    }
    intercept[IllegalArgumentException] {
      Interleave.positions(docs, "source", "doc_id", lit(0L))
    }
  }
}
