package graft

import org.apache.spark.sql.DataFrame

/** Plan-hygiene invariants — the properties that keep these queries viable
  * at 100 TB, asserted against the actual physical plans so a regression
  * (a lost pushdown, a sneaky cross product, a de-broadcast) fails CI
  * rather than surfacing as a cluster bill. */
class PlanAuditSpec extends SparkSpec {

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf0001)

  private def executedPlan(df: DataFrame): String = {
    df.collect() // materialize so AQE settles on the final plan
    df.queryExecution.executedPlan.toString
  }

  test("q_f1: window filter pushes a raw-column range into the parquet scan") {
    val plan = executedPlan(q("q_f1_window_filter"))
    assert(plan.contains("PushedFilters: [GreaterThanOrEqual(o_orderdate")
      || plan.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual"),
      s"no pushed range on o_orderdate:\n${plan.take(2000)}")
  }

  test("q_p2: column pruning — scan reads only the 3 projected columns") {
    val plan = executedPlan(q("q_p2_project"))
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    assert(readSchema.contains("c_custkey") && readSchema.contains("c_acctbal")
      && readSchema.contains("c_nationkey"))
    assert(!readSchema.contains("c_name") && !readSchema.contains("c_comment"),
      s"scan reads unprojected columns: $readSchema")
  }

  test("q_j4: AQE chooses a broadcast join for the dim side (no forced hint)") {
    val plan = executedPlan(q("q_j4_join_agg"))
    assert(plan.contains("BroadcastHashJoin"),
      s"dim join did not broadcast:\n${plan.take(2000)}")
  }

  test("near-dup and ANN queries never contain a cross product") {
    for (name <- Seq("q_d2_minhash_neardup", "q_d3_neardup_ensemble",
        "q_v2_ann_lsh")) {
      val plan = executedPlan(q(name))
      assert(!plan.contains("CartesianProduct")
        && !plan.contains("BroadcastNestedLoopJoin"),
        s"$name plan contains a cross product")
    }
  }

  test("aggregate battery stays in whole-stage codegen") {
    val plan = executedPlan(q("q_a6_groupby_multi"))
    assert(plan.contains("*(") , "TPC-H Q1 skeleton lost codegen")
  }
}
