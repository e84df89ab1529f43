package graft

import org.apache.spark.sql.types._

/** Engine-side half of the battery hash-safety gate (VERDICT r8 #2).
  *
  * The driver's correctness gate hashes both frames after a dtype
  * canonicalization that is fragile for DECIMAL columns: r7 q_qr3 and
  * r8 q_a10/q_s11 were all VALUE-EXACT yet hash-red purely on the
  * decimal representation. The battery convention is therefore: money
  * and other fixed-point results may COMPUTE in DecimalType (exactness
  * is the point) but must EMIT as scaled-BIGINT cents or canonical
  * digit strings. This spec walks every battery query's output schema
  * at sf0.001 and fails on any DecimalType — nested included — so a new
  * query carrying the fragile class cannot reach the driver. (The
  * oracle-side half — DuckDB DECIMAL/HUGEINT widening and cross-frame
  * dtype-class drift — is `scripts/hash_lint.py`, which DESCRIBEs every
  * oracle without executing it; run it with check_oracle.py at the gate
  * scale.)
  *
  * FloatType (float32) is also banned: no oracle can produce a float32
  * column (DuckDB frames land float64), so it would always be a
  * cross-frame class mismatch.
  */
class HashSafetySpec extends SparkSpec {

  private def fragile(dt: DataType): Option[String] = dt match {
    case _: DecimalType => Some(dt.simpleString)
    case FloatType => Some("float")
    case ArrayType(e, _) => fragile(e)
    case MapType(k, v, _) => fragile(k).orElse(fragile(v))
    case s: StructType =>
      s.fields.view.flatMap(f => fragile(f.dataType)).headOption
    case _ => None
  }

  test("no battery query emits a hash-fragile output dtype (DECIMAL/float32)") {
    // construction only — schemas are known without running jobs; the
    // handful of protocol queries that stage sink files at construction
    // time do so at sf0.001 (the same work Verify performs)
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val schema =
          try fn(spark, sf0001).schema
          catch { case e: Throwable =>
            fail(s"$name failed to construct at sf0.001: ${e.getMessage}")
          }
        schema.fields.flatMap(f =>
          fragile(f.dataType).map(t => s"$name.${f.name}: $t"))
    }
    assert(bad.isEmpty,
      s"hash-fragile output columns (emit cents/digit-strings instead):\n" +
        bad.mkString("\n"))
  }

  test("the gate itself catches a seeded DECIMAL output") {
    import org.apache.spark.sql.functions._
    val df = spark.range(1)
      .select(lit(BigDecimal("1.23")).cast("decimal(38,2)").as("total"))
    assert(fragile(df.schema("total").dataType).contains("decimal(38,2)"))
  }
}
