package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusDiffSpec extends SparkSpec {
  import spark.implicits._

  test("all four statuses, by hand") {
    val oldSnap = Seq(
      (1L, "kept the same"),
      (2L, "will be edited"),
      (3L, "will be deleted")).toDF("doc_id", "text")
    val newSnap = Seq(
      (1L, "kept the same"),
      (2L, "was edited"),
      (4L, "brand new")).toDF("doc_id", "text")
    val got = CorpusDiff.diff(oldSnap, newSnap, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
    val rep = CorpusDiff.report(oldSnap, newSnap, "doc_id", "text")
      .as[(String, Long, String)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rep === Map("unchanged" -> ((1L, "1")), "changed" -> ((1L, "2")),
      "removed" -> ((1L, "3")), "added" -> ((1L, "4"))))
  }

  test("id_sum witness is a canonical digit STRING (r7 driver-red pin)") {
    // r7's only driver-red was this column: bit-exact DECIMAL(38,0)
    // values hash-mismatching across engines' binary decimal layouts.
    // The representation contract is now part of the operator: the
    // witness column is StringType, rendered as plain digits with no
    // scale markers, even for sums past 2^63.
    val big = 4000000000L // 4e9 — pairwise sums exceed Int, stress rendering
    val oldSnap = Seq((big, "a"), (big + 1, "b"), (big + 2, "c"))
      .toDF("doc_id", "text")
    val rep = CorpusDiff.report(oldSnap, oldSnap, "doc_id", "text")
    import org.apache.spark.sql.types.StringType
    assert(rep.schema("id_sum").dataType === StringType)
    val Seq((st, n, w)) =
      rep.as[(String, Long, String)].collect().toSeq
    assert((st, n, w) === (("unchanged", 3L, "12000000003")))
    assert(w.forall(_.isDigit), s"non-canonical witness rendering: $w")
  }

  test("null content is a value, not absence (review)") {
    // review-caught: a raw md5 null would read the row as ABSENT —
    // a null-text doc present only in old must be 'removed', not 'added'
    val oldSnap = Seq((1L, Option.empty[String]), (2L, Option.empty[String]),
      (3L, Some("real"))).toDF("doc_id", "text")
    val newSnap = Seq((2L, Some("now filled")), (3L, Option.empty[String]))
      .toDF("doc_id", "text")
    val got = CorpusDiff.diff(oldSnap, newSnap, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got === Map(
      1L -> "removed",   // null-text doc gone from new
      2L -> "changed",   // null -> real content
      3L -> "changed"))  // real content -> null
  }

  test("null ids drop from both snapshots") {
    val oldSnap = Seq((Some(1L), "a"), (None, "ghost")).toDF("doc_id", "text")
    val newSnap = Seq((Some(1L), "a"), (None, "ghost2")).toDF("doc_id", "text")
    val got = CorpusDiff.diff(oldSnap, newSnap, "doc_id", "text")
      .as[(Long, String)].collect().toSeq
    assert(got === Seq(1L -> "unchanged"))
  }

  test("the join ships fingerprints, not documents") {
    // the scale contract: both sides project to (id, md5) BEFORE the
    // full-outer join, so the shuffle payload is fixed-width and the
    // join's output schema carries no content column
    val dir = tmpDir("cdiff")
    spark.range(1000)
      .select($"id".as("doc_id"),
        concat(lit("x" * 1000), $"id".cast("string")).as("text"))
      .write.mode("overwrite").parquet(dir)
    val snap = spark.read.parquet(dir)
    val out = CorpusDiff.diff(snap, snap, "doc_id", "text")
    out.collect()
    import org.apache.spark.sql.catalyst.expressions.Attribute
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    // AQE hides the join behind stage-wrapper leaves — recurse through them
    def joinsIn(p: SparkPlan): Seq[Seq[Attribute]] = p match {
      case a: AdaptiveSparkPlanExec => joinsIn(a.executedPlan)
      case q: QueryStageExec => joinsIn(q.plan)
      case j: SortMergeJoinExec =>
        Seq(j.output) ++ j.children.flatMap(joinsIn)
      case j: ShuffledHashJoinExec =>
        Seq(j.output) ++ j.children.flatMap(joinsIn)
      case other => other.children.flatMap(joinsIn)
    }
    val joins = joinsIn(out.queryExecution.executedPlan)
    assert(joins.nonEmpty, "expected a shuffled join in the diff plan")
    val cols = joins.flatten.map(_.name).toSet
    assert(!cols.contains("text"),
      s"join output carries document content: $cols")
  }
}
