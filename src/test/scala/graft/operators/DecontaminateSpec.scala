package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  // eval doc shares the 3-gram "c d e" with train doc 1 (once, despite
  // appearing twice there — distinct semantics) and nothing with doc 2
  private def train = Seq(
    (1L, "a b c d e x c d e y"),
    (2L, "p q r s t u v"),
    (3L, "c d e f g")
  ).toDF("doc_id", "text")
  private def eval_ = Seq((100L, "z z c d e f z")).toDF("doc_id", "text")

  test("overlaps: exact distinct shared-shingle counts, clean docs absent") {
    val got = Decontaminate.overlaps(train, eval_, "doc_id", "text",
        shingleLen = 3)
      .as[(Long, Long)].collect().toMap
    // eval 3-grams: {z z c, z c d, c d e, d e f, e f z}
    // doc 1 grams: {a b c, b c d, c d e, d e x, e x c, x c d, d e y, c d e(dup)}
    //   -> shares {c d e} = 1
    // doc 3 grams: {c d e, d e f, e f g} -> shares {c d e, d e f} = 2
    assert(got === Map(1L -> 1L, 3L -> 2L))
  }

  test("clean removes exactly the contaminated docs") {
    val kept = Decontaminate.clean(train, eval_, "doc_id", "text",
        shingleLen = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L))
  }

  test("prune: overlap threshold — minOverlap 2 keeps the 1-gram doc") {
    // doc 1 shares 1 shingle, doc 3 shares 2 (see the overlaps test):
    // minOverlap 2 drops only doc 3; default (1) ≡ clean drops both
    val kept2 = Decontaminate.prune(train, eval_, "doc_id", "text",
        shingleLen = 3, minOverlap = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(kept2 === Set(1L, 2L))
    val kept1 = Decontaminate.prune(train, eval_, "doc_id", "text",
        shingleLen = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept1 === Set(2L))
    intercept[IllegalArgumentException] {
      Decontaminate.prune(train, eval_, "doc_id", "text", minOverlap = 0)
    }
  }

  test("eval side broadcasts; the training corpus is never shuffled whole") {
    val df = Decontaminate.overlaps(train.repartition(4), eval_,
      "doc_id", "text", shingleLen = 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"),
      s"eval-gram join did not broadcast:\n${plan.take(2000)}")
  }
}
