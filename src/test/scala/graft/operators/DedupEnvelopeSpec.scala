package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupEnvelopeSpec extends SparkSpec {
  import spark.implicits._

  test("firstByKey keeps the min-tiebreak row deterministically, any partitioning") {
    val rows = (1 to 100).flatMap(k =>
      Seq((k, 3, s"c$k"), (k, 1, s"a$k"), (k, 2, s"b$k")))
    for (parts <- Seq(1, 4, 13)) {
      val df = rows.toDF("k", "tb", "v").repartition(parts)
      val kept = Dedup.firstByKey(df, "k", "tb")
        .select("v").as[String].collect().toSet
      assert(kept == (1 to 100).map(k => s"a$k").toSet, s"parts=$parts")
    }
  }

  test("byKey keeps exactly one row per key") {
    val df = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
    assert(Dedup.byKey(df, "k").count() == 2)
  }

  test("duplicateKeys reports keys above the threshold") {
    val df = Seq(1, 1, 1, 2, 2, 3).toDF("k")
    val dups = Dedup.duplicateKeys(df, "k", 1)
      .orderBy("k").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(dups.toSeq == Seq((1, 3L), (2, 2L)))
  }

  test("envelope round-trip: from_json(to_json(x)) preserves values (X6/X7)") {
    val src = Seq((1, "alice", 10.5), (2, "bob", -3.25)).toDF("id", "name", "bal")
    val env = Envelope.project(src, col("id"), "test", "2024-01-01", "2025-12-31")
    assert(env.columns.toSeq == Envelope.Columns)
    val schema = "id INT, name STRING, bal DOUBLE"
    val back = env.select(from_json(col("payload"),
        org.apache.spark.sql.types.StructType.fromDDL(schema)).as("r"))
      .select("r.id", "r.name", "r.bal")
      .as[(Int, String, Double)].collect().toSet
    assert(back == Set((1, "alice", 10.5), (2, "bob", -3.25)))
  }

  test("envelope request_payload carries the extraction parameters") {
    val src = Seq((1, "x")).toDF("id", "v")
    val env = Envelope.project(src, col("id"), "customer", "2024-01-01", "2025-12-31")
    val req = env.select(
      get_json_object(col("request_payload"), "$.entity_type"),
      get_json_object(col("request_payload"), "$.fecha_inicio"))
      .as[(String, String)].head()
    assert(req == ("customer", "2024-01-01"))
  }

  test("parsePayload is PERMISSIVE: malformed payloads become null, not errors") {
    val df = Seq("""{"Id":"1","TotalAmt":5.0}""", "NOT JSON").toDF("payload")
    val parsed = Envelope.parsePayload(df, graft.plans.Schemas.invoice)
    assert(parsed.filter(col("rec.Id").isNotNull).count() == 1)
    assert(parsed.count() == 2)
  }
}
