package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish occurrence stream: key k occurs ~N/k times
  private def zipf(n: Int, keys: Int) =
    (1 to keys).flatMap(k => (1 to (n / k)).map(_ => s"key$k")).toDF("k")

  private def exact(df: org.apache.spark.sql.DataFrame, t: Long) =
    df.groupBy($"k").agg(count(lit(1)).as("n")).filter($"n" >= t)
      .as[(String, Long)].collect().toMap

  test("frequent == GROUP BY HAVING, threshold boundary inclusive") {
    val df = zipf(1000, 50)
    val want = exact(df, 25)
    val got = HeavyHitters.frequent(df, $"k", 25)
      .as[(String, Long)].collect().toMap
    assert(got === want)
    // boundary: a key at exactly minCount stays, one below goes
    assert(got.contains("key40") === (1000 / 40 >= 25))
    assert(!got.contains("key41")) // 1000/41 = 24 < 25
  }

  test("exact at ANY sketch size: an adversarially tiny sketch changes nothing") {
    // eps 0.5 → width ~6 cells for hundreds of distinct keys — the
    // screen's estimates are wildly inflated (nearly everything passes),
    // but Count-Min never UNDERestimates, so the exact confirm still
    // produces the identical answer (the q_t19 fpp=0.5 analog)
    val df = zipf(2000, 200)
    val want = exact(df, 40)
    val got = HeavyHitters.frequent(df, $"k", 40, eps = 0.5)
      .as[(String, Long)].collect().toMap
    assert(got === want)
  }

  test("null keys drop; empty input yields empty output") {
    val df = Seq(Some("a"), Some("a"), None, Some("b")).toDF("k")
    val got = HeavyHitters.frequent(df, $"k", 2)
      .as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 2L))
    assert(HeavyHitters.frequent(df.filter(lit(false)), $"k", 1)
      .collect().isEmpty)
  }

  test("the screen is a codegen'd predicate in the plan, before the agg") {
    // parquet-backed, not a LocalRelation — ConvertToLocalRelation would
    // otherwise evaluate the screen at OPTIMIZATION time and erase it
    // from the executed plan
    val dir = tmpDir("hh_plan")
    zipf(1000, 50).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val out = HeavyHitters.frequent(df, $"k", 25)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("graft_cms_at_least"),
      s"CMS screen missing from plan:\n${plan.take(2000)}")
    // the screen must sit below the exchange (map-side), not above it
    val screenAt = plan.indexOf("graft_cms_at_least")
    val exchangeAt = plan.indexOf("Exchange")
    assert(exchangeAt >= 0 && screenAt > exchangeAt,
      "screen should print BELOW the exchange (applied map-side)")
  }

  test("frequentPhrases counts occurrences, not per-document presence") {
    val docs = Seq(
      (1L, "spam spam spam spam"), // "spam spam" occurs 3x HERE
      (2L, "ham and eggs"),
      (3L, "spam spam again")).toDF("doc_id", "text")
    val got = HeavyHitters.frequentPhrases(docs, "text",
        n = 2, minCount = 3)
      .as[(String, Long)].collect().toMap
    assert(got === Map("spam spam" -> 4L))
  }
}
