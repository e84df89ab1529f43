package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LuhnSpec extends SparkSpec {
  import spark.implicits._

  // plain-Scala reference Luhn
  private def refLuhn(s: String): Boolean =
    s.reverse.zipWithIndex.map { case (ch, i) =>
      val d = ch - '0'
      if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
    }.sum % 10 == 0

  private def valid(ss: Seq[String]): Map[String, Boolean] =
    ss.toDF("s").select(col("s"),
        TextAnalysis.luhnValid(col("s")).as("v"))
      .as[(String, Boolean)].collect().toMap

  test("known test PANs validate; single-digit typos fail") {
    val got = valid(Seq(
      "4111111111111111", // visa test
      "378282246310005", // amex test (15 digits — odd length path)
      "5555555555554444", // mastercard test
      "6011111111111117", // discover test
      "4111111111111112", // typo of the visa number
      "378282246310006"))
    assert(got("4111111111111111") && got("378282246310005") &&
      got("5555555555554444") && got("6011111111111117"))
    assert(!got("4111111111111112") && !got("378282246310006"))
  }

  test("property: engine agrees with plain-Scala Luhn on seeded runs") {
    val rnd = new scala.util.Random(19)
    val runs = Seq.fill(300)(
      (13 + rnd.nextInt(7), math.abs(rnd.nextLong())) match {
        case (len, seed) =>
          Seq.tabulate(len)(i => ((seed >> (i % 60)) + i * 7) % 10)
            .map(d => ('0' + math.abs(d).toInt).toChar).mkString
      })
    val got = valid(runs.distinct)
    runs.distinct.foreach(s => assert(got(s) === refLuhn(s), s))
    // the precision claim: random runs pass ~1 in 10, not most
    val share = runs.distinct.count(refLuhn).toDouble / runs.distinct.size
    assert(share < 0.25, s"fixture degenerate: $share of runs pass Luhn")
  }

  test("cardAudit: counts runs, validates only real check digits") {
    val docs = Seq(
      (1L, "pay 4111111111111111 or 4111111111111112 today"),
      (2L, "no digits here"),
      (3L, null.asInstanceOf[String]),
      (4L, "short 123456 run and amex 378282246310005")).toDF("doc_id", "text")
    val got = TextAnalysis.cardAudit(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toMap2
    assert(got(1L) === ((2L, 1L)))
    assert(got(2L) === ((0L, 0L)))
    assert(got(3L) === ((0L, 0L)))
    assert(got(4L) === ((1L, 1L)))
  }

  private implicit class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> (r._2, r._3)).toMap
  }
}
