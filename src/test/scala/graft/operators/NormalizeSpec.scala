package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unicode NFC normalization (L103): canonical composition across
  * scripts, idempotence, null propagation, SQL/Column parity, codegen
  * residency, and the dedup-gain report. All non-ASCII is written as
  * explicit \\u escapes — the NFC/NFD distinction is invisible in
  * rendered text, and an editor renormalizing the file must not be able
  * to change what these tests assert. */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val CafeNfc = "caf\u00e9"     // precomposed e-acute
  private val CafeNfd = "caf\u0065\u0301"  // e + combining acute

  private def nfcOf(s: String): String = {
    val out = Seq(Tuple1(s)).toDF("t")
      .select(Normalize.nfc(col("t")).as("n")).collect()
    out.head.getString(0)
  }

  test("composes canonical decompositions across scripts") {
    assert(nfcOf(CafeNfd) === CafeNfc)                  // Latin
    assert(nfcOf("\u1100\u1161") === "\uac00")  // Hangul GA
    assert(nfcOf("o\u0308") === "\u00f6")        // o-umlaut
    // already-NFC strings are unchanged (quick-check fast path)
    assert(nfcOf("plain ascii") === "plain ascii")
    assert(nfcOf(CafeNfc) === CafeNfc)
  }

  test("idempotent and null-propagating") {
    assert(nfcOf(nfcOf(CafeNfd)) === nfcOf(CafeNfd))
    val out = Seq(Tuple1(Option.empty[String])).toDF("t")
      .select(Normalize.nfc(col("t")).as("n")).collect()
    assert(out === Array(Row(null)))
  }

  test("NFC does NOT fold compatibility characters (that would be NFKC)") {
    // U+FB01 LATIN SMALL LIGATURE FI is compatibility-equivalent, not
    // canonically equivalent — a dedup key must not merge it
    assert(nfcOf("\ufb01n") === "\ufb01n")
  }

  test("graft_nfc is SQL-callable and agrees with the Column form") {
    // the NFD bytes ride in via interpolation: Spark's chr() is
    // ASCII-mod-256, so chr(769) cannot build the combining mark in SQL
    val viaSql = spark.sql(
      s"SELECT graft_nfc('$CafeNfd') AS n")
        .collect().head.getString(0)
    assert(viaSql === CafeNfc)
    assert(viaSql === nfcOf(CafeNfd))
  }

  test("normalization stays inside whole-stage codegen") {
    // a pure-literal frame constant-folds to a LocalTableScan, which
    // would vacuously pass — mix in range's id to force a real per-row
    // projection
    val df = spark.range(4)
      .select(Normalize.nfc(
        concat(lit(CafeNfd), col("id").cast("string"))).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"),
      s"graft_nfc fell out of whole-stage codegen:\n$plan")
    val rows = df.collect().map(_.getString(0))
    assert(rows.forall(_.startsWith(CafeNfc)), rows.mkString(","))
  }

  test("dedup-gain report: NFC merges what raw md5 keeps apart") {
    val docs = Seq(
      ("s1", CafeNfc), ("s1", CafeNfd),  // one class, two byte forms
      ("s1", "other"),
      ("s2", "same"), ("s2", "same")     // byte-equal dups
    ).toDF("source", "text")
    val out = Normalize.nfcDedupGain(docs, "text", "source")
      .orderBy("grp").collect().toSeq
    assert(out === Seq(
      Row("s1", 3L, 3L, 2L, 1L),   // 3 rows, 3 raw classes, 2 nfc classes
      Row("s2", 2L, 1L, 1L, 0L)))  // byte-equal dups need no normalization
  }
}
