package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** L175 readability panel (r15): hand-counted syllable/sentence/word
  * rationals through the exact Flesch cascades. */
class ReadabilitySpec extends SparkSpec {
  import spark.implicits._

  private def eval(text: String): (Option[Long], Option[Long]) = {
    val r = Seq(Tuple1(text)).toDF("t")
      .select(TextAnalysis.fleschReadingEase(col("t")).as("fre"),
        TextAnalysis.fleschKincaidGrade(col("t")).as("fk"))
      .collect().head
    (if (r.isNullAt(0)) None else Some(r.getLong(0)),
      if (r.isNullAt(1)) None else Some(r.getLong(1)))
  }

  private def syl(text: String): Int =
    Seq(Tuple1(text)).toDF("t")
      .select(TextAnalysis.syllableCount(col("t")).as("s"))
      .collect().head.getInt(0)

  test("syllables: vowel runs per word, vowel-less words floor at 1") {
    assert(syl("the cat sat") === 3)          // one run each
    assert(syl("beautiful idea") === 5)       // eau-i-u + i-ea
    assert(syl("rhythm 72 tv") === 3)         // three vowel-less floors
    assert(syl("queue") === 1)                // one contiguous run
  }

  test("flesch: hand-worked sentence lands the exact cascade") {
    // "the cat sat on the mat." → W=6, S=1, Syl=6
    // FRE = 206835000 − 1015000·6 − 84600000·6/6 = 116145000
    // FK  = 390000·6 + 11800000·6/6 − 15590000 = −1450000
    val (fre, fk) = eval("the cat sat on the mat.")
    assert(fre === Some(116145000L))
    assert(fk === Some(-1450000L))
  }

  test("flesch: fragment without terminator counts one sentence") {
    // same words, no period — S floors at 1, identical values
    assert(eval("the cat sat on the mat") ===
      eval("the cat sat on the mat."))
  }

  test("flesch: polysyllabic prose reads harder (lower FRE, higher FK)") {
    val (freEasy, fkEasy) = eval("the cat sat. the dog ran.")
    val (freHard, fkHard) =
      eval("organizational repercussions necessitate reevaluation.")
    assert(freHard.get < freEasy.get && fkHard.get > fkEasy.get)
  }

  test("flesch: empty and whitespace text is NULL, not a fake grade") {
    assert(eval("") === ((None, None)))
    assert(eval("   ") === ((None, None)))
  }
}
