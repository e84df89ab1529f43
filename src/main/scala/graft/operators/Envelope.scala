package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's fixed 8-column raw envelope — one schema shared by all
  * three sink tables (init_qb_schema.sql:3-34, FIXTURES.md §1): entity id +
  * the verbatim record as a JSON payload + extraction metadata columns. */
final case class RawEnvelope(
    id: String,
    payload: String,
    ingested_at_utc: Timestamp,
    extract_window_start_utc: Timestamp,
    extract_window_end_utc: Timestamp,
    page_number: Int,
    page_size: Int,
    request_payload: String)

/** P1: envelope projection — wrap an entity DataFrame into the raw envelope
  * (extract_qb_customers_py.py:69-88). The payload keeps the whole record
  * (`to_json(struct(*))`), zero projection, for raw fidelity; queries parse
  * it back with `from_json` / `get_json_object` (X7).
  *
  * Scale note: a pure narrow projection — no shuffle; `to_json` is a
  * codegen'd Catalyst expression, so the whole stage fuses with the scan.
  */
object Envelope {

  val Columns: Seq[String] = Seq("id", "payload", "ingested_at_utc",
    "extract_window_start_utc", "extract_window_end_utc",
    "page_number", "page_size", "request_payload")

  def project(entity: DataFrame, idCol: Column, entityType: String,
      lo: String, hi: String, environment: String = "sandbox",
      pageNumber: Int = 1, pageSize: Int = 100): DataFrame = {
    val allCols = entity.columns.map(col).toSeq
    entity.select(
      idCol.cast("string").as("id"),
      to_json(struct(allCols: _*)).as("payload"),
      current_timestamp().as("ingested_at_utc"),
      to_timestamp(lit(lo)).as("extract_window_start_utc"),
      to_timestamp(lit(hi)).as("extract_window_end_utc"),
      lit(pageNumber).as("page_number"),
      lit(pageSize).as("page_size"),
      // request metadata as serialized JSON (extract_qb_customers_py.py:81-87)
      to_json(struct(
        lit(entityType).as("entity_type"),
        lit(lo).as("fecha_inicio"),
        lit(hi).as("fecha_fin"),
        lit(environment).as("environment"))).as("request_payload"))
  }

  /** X7: parse a payload column back to typed fields with an explicit
    * schema (PERMISSIVE — malformed payloads yield nulls, never failures). */
  def parsePayload(df: DataFrame, schema: org.apache.spark.sql.types.StructType,
      payloadCol: String = "payload", as: String = "rec"): DataFrame =
    df.withColumn(as, from_json(col(payloadCol), schema,
      Map("mode" -> "PERMISSIVE")))
}
