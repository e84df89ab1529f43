package graft.plans

import org.apache.spark.sql.types._

/** Declared payload entity schemas (SURVEY.md §1.2-§1.3: explicit
  * StructTypes preferred over inference for determinism). Shapes follow
  * FIXTURES.md §2-§4, which derive from the reference DDL
  * (init_qb_schema.sql) and observed warehouse payloads (heap evidence
  * /root/reference/warehouse_data/base/16384/{16416,16421,16426}).
  *
  * Money fields are DoubleType here because the test tables carry doubles;
  * a production QBO deployment would use DecimalType(38,2) (SURVEY §1.2
  * note on 2-dp currency). */
object Schemas {

  val currencyRef: StructType = StructType(Seq(
    StructField("value", StringType),
    StructField("name", StringType)))

  val metaData: StructType = StructType(Seq(
    StructField("CreateTime", StringType),
    StructField("LastUpdatedTime", StringType)))

  /** Invoice.Line[] element — variant by DetailType: SalesItemLineDetail /
    * SubTotalLineDetail as sparse struct fields (heap 16421). */
  val invoiceLine: StructType = StructType(Seq(
    StructField("Id", StringType),
    StructField("LineNum", LongType),
    StructField("Amount", DoubleType),
    StructField("DetailType", StringType),
    StructField("Description", StringType),
    StructField("SalesItemLineDetail", StructType(Seq(
      StructField("Qty", DoubleType),
      StructField("UnitPrice", DoubleType),
      StructField("ItemRef", currencyRef),
      StructField("TaxCodeRef", StructType(Seq(StructField("value", StringType))))))),
    StructField("SubTotalLineDetail", StructType(Nil))))

  /** Invoice payload (FIXTURES.md §3) — the query-surface subset: envelope
    * queries parse `payload` with this and explode `Line`. */
  val invoice: StructType = StructType(Seq(
    StructField("Id", StringType),
    StructField("DocNumber", StringType),
    StructField("TxnDate", StringType),
    StructField("DueDate", StringType),
    StructField("Balance", DoubleType),
    StructField("TotalAmt", DoubleType),
    StructField("CustomerRef", currencyRef),
    StructField("Line", ArrayType(invoiceLine)),
    StructField("MetaData", metaData)))

  /** Customer payload (FIXTURES.md §2) — fields used by the F1 filter and
    * J4 join surface. */
  val customer: StructType = StructType(Seq(
    StructField("Id", StringType),
    StructField("DisplayName", StringType),
    StructField("Active", BooleanType),
    StructField("Taxable", BooleanType),
    StructField("Balance", DoubleType),
    StructField("CurrencyRef", currencyRef),
    StructField("MetaData", metaData)))

  /** Item payload (FIXTURES.md §4). */
  val item: StructType = StructType(Seq(
    StructField("Id", StringType),
    StructField("Name", StringType),
    StructField("Active", BooleanType),
    StructField("Type", StringType),
    StructField("UnitPrice", DoubleType),
    StructField("Taxable", BooleanType),
    StructField("MetaData", metaData)))
}
