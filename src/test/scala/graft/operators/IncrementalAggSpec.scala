package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val G = Seq("g")

  private def norm(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(col("g"))
      .as[(String, Long, Option[BigDecimal], Option[BigDecimal],
        Option[BigDecimal])]
      .collect().toSeq

  test("merge(partials(A), partials(B)) == partials(A ++ B) (seeded splits)") {
    val rnd = new scala.util.Random(74)
    val rows = (1 to 500).map { i =>
      (s"g${rnd.nextInt(6)}",
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(20000) / 100.0))
    }
    val df = rows.toDF("g", "v")
    for (trial <- 1 to 3) {
      val cut = rnd.nextInt(rows.size)
      val (a, b) = rows.splitAt(cut)
      val merged = IncrementalAgg.merge(
        IncrementalAgg.partials(a.toDF("g", "v"), G, "v"),
        IncrementalAgg.partials(b.toDF("g", "v"), G, "v"), G)
      assert(norm(merged) === norm(IncrementalAgg.partials(df, G, "v")),
        s"trial $trial cut=$cut")
    }
  }

  test("empty delta is the identity; repeated merges keep the schema stable") {
    val base = IncrementalAgg.partials(
      Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("g", "v"), G, "v")
    val empty = IncrementalAgg.partials(
      Seq.empty[(String, Double)].toDF("g", "v"), G, "v")
    var acc = base
    for (_ <- 1 to 3) acc = IncrementalAgg.merge(acc, empty, G)
    assert(norm(acc) === norm(base))
    assert(acc.schema === base.schema)
  }

  test("all-null group: n counts rows, value aggregates stay null through merges") {
    val p1 = IncrementalAgg.partials(
      Seq(("a", None: Option[Double]), ("a", None)).toDF("g", "v"), G, "v")
    val p2 = IncrementalAgg.partials(
      Seq(("a", None: Option[Double])).toDF("g", "v"), G, "v")
    val m = norm(IncrementalAgg.merge(p1, p2, G))
    assert(m === Seq(("a", 3L, None, None, None)))
  }

  test("report derives the exact decimal average; collision guard") {
    val p = IncrementalAgg.partials(
      Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v"), G, "v")
    val r = IncrementalAgg.report(p, G)
      .select(col("g"), col("avg_v")).as[(String, BigDecimal)].head()
    assert(r._2 === BigDecimal("1.50"))
    intercept[IllegalArgumentException] {
      IncrementalAgg.partials(Seq(("a", 1.0)).toDF("n", "v"), Seq("n"), "v")
    }
  }
}
