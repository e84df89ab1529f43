package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Boundary semantics of the extraction-window filters — string compare on
  * ISO days, inclusive both ends, null keys dropped (extract_qb_customers_py
  * .py:61-67, extract_qb_invoices.py:61-69). */
class WindowFiltersSpec extends SparkSpec {
  import spark.implicits._

  test("dateWindow: inclusive bounds, string-lexicographic compare") {
    val df = Seq("2023-12-31", "2024-01-01", "2024-06-15", "2025-12-31",
      "2026-01-01").toDF("d")
    val kept = WindowFilters.dateWindow(df, col("d"), "2024-01-01", "2025-12-31")
      .as[String].collect().toSet
    assert(kept == Set("2024-01-01", "2024-06-15", "2025-12-31"))
  }

  test("dateWindow: null timestamps are dropped (reference drops missing)") {
    val df = Seq(Some("2024-06-15"), None).toDF("d")
    assert(WindowFilters.dateWindow(df, col("d"), "2024-01-01", "2025-12-31")
      .count() == 1)
  }

  test("dateWindow truncates full timestamps to the ISO day") {
    val df = Seq("2024-01-01T23:59:59-07:00", "2023-12-31T23:59:59Z").toDF("d")
    val kept = WindowFilters.dateWindow(df, col("d"), "2024-01-01", "2025-12-31")
      .as[String].collect().toSet
    assert(kept == Set("2024-01-01T23:59:59-07:00")) // local date string, no tz shift
  }

  test("coalescingDateWindow: primary wins when present") {
    val df = Seq(
      (Some("2024-06-01"), Some("1999-01-01T00:00:00Z")), // primary in, fallback out
      (Some("1999-06-01"), Some("2024-01-01T00:00:00Z"))  // primary out (despite fallback in)
    ).toDF("p", "f")
    val kept = WindowFilters.coalescingDateWindow(df, col("p"), col("f"),
      "2024-01-01", "2025-12-31")
    assert(kept.count() == 1)
    assert(kept.select("p").as[String].head() == "2024-06-01")
  }

  test("coalescingDateWindow: fallback used when primary null; both null drops") {
    val df = Seq[(Option[String], Option[String])](
      (None, Some("2024-03-03T10:00:00Z")),
      (None, None)
    ).toDF("p", "f")
    val kept = WindowFilters.coalescingDateWindow(df, col("p"), col("f"),
      "2024-01-01", "2025-12-31")
    assert(kept.count() == 1)
  }

  test("dropNullKeys removes only null-keyed rows") {
    val df = Seq((Some(1), "a"), (None, "b"), (Some(2), "c")).toDF("id", "v")
    assert(WindowFilters.dropNullKeys(df, "id").count() == 2)
  }
}
