package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-insensitive mergeable corpus digest — the data-integrity
  * manifest a multi-generation pipeline carries next to its tables:
  * "is the sink EXACTLY the union of the batches I appended", answered
  * without re-comparing rows. The governance companion of the sketch
  * family's metadata-fold economics ([[Kmv]]/[[QuantileSketch]]): the
  * digest of a 100 TB table is one grid-sized row per group, a new
  * generation folds in with pure arithmetic, and equality of digests
  * is the audit.
  *
  * Construction (exact, both-engine replayable): each row hashes to
  * the house 56-bit md5 over the LENGTH-PREFIXED canonical rendering
  * of the key columns — each value renders as `len:value` (char
  * length) and null as the bare `-`, concatenated with no separator:
  * length prefixes make the encoding injective, so ("a", null) differs
  * from (null, "a"), ("a", "") from ("a"), and no in-band marker can
  * alias a real value (the flaw a fixed null-sentinel would have). A
  * group's digest is the triple
  *   (n_rows, h_sum, h_xor)
  * with h_sum the exact integer sum (DECIMAL(38,0) — 10^18 rows of
  * 56-bit hashes stay < 10^35, emitted as the canonical digit string)
  * and h_xor the bitwise XOR (BIGINT). Both aggregations are
  * commutative and associative, so the digest is independent of row
  * order, partitioning and batch boundaries, and
  *   merge(digest(A), digest(B)) = digest(A disjoint-union B)
  * is an algebraic identity over disjoint batches (bag semantics —
  * duplicate rows COUNT, by design: an accidental double-append must
  * change the digest; that is the point).
  *
  * Detection stance, stated honestly: a forged collision needs a row
  * multiset with equal count, equal 56-bit sum AND equal XOR — far
  * beyond accident (the battery's no-collision class) but NOT
  * cryptographic tamper-proofing (md5 + linear accumulators; an
  * adversary with write access can engineer equality — this is a
  * CORRUPTION/DRIFT detector, not a signature).
  *
  * Scale shape: one map-side-combinable aggregation — partials combine
  * per partition, nothing but (count, sum, xor) triples cross the
  * exchange; merge is grid arithmetic on the manifest table. */
object Manifest {

  /** Injective rendering: `len:value`, null renders as `-`. */
  private def render(c: Column): Column = {
    val s = c.cast("string")
    when(s.isNull, lit("-"))
      .otherwise(concat(length(s).cast("string"), lit(":"), s))
  }

  /** 56-bit row hash over the canonical rendering of `cols`. */
  private def rowHash(cols: Seq[Column]): Column =
    conv(substring(md5(concat(cols.map(render): _*)
      .cast("binary")), 1, 14), 16, 10).cast("long")

  /** Per-group digest: (groupCols…, n_rows, h_sum, h_xor). `keyCols`
    * name the columns that define row identity (order significant —
    * they join into the rendering in the given order). */
  def digest(df: DataFrame, groupCols: Seq[String],
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    Reserved.guard(groupCols,
      Seq("__h", "n_rows", "h_sum", "h_xor"), "Manifest")
    val hashed = df.select(
      groupCols.map(col) :+ rowHash(keyCols.map(col)).as("__h"): _*)
    val grouped =
      if (groupCols.isEmpty) hashed.groupBy()
      else hashed.groupBy(groupCols.map(col): _*)
    grouped.agg(count(lit(1)).as("n_rows"),
      sum(col("__h").cast("decimal(38,0)")).cast("string").as("h_sum"),
      call_function("bit_xor", col("__h")).as("h_xor"))
  }

  /** JVM mirror of the batch row hash, for the
    * [[graft.streaming.StreamingManifest]] twin — spec-pinned against
    * the expression (ManifestSpec) so the twins cannot drift. Values
    * arrive PRE-RENDERED to strings (the caller applies the same cast
    * the batch side does); None is SQL null. The length prefix counts
    * CODE POINTS (Spark `length` semantics, not UTF-16 units — pinned
    * on an astral character). */
  def rowHashJvm(keys: Seq[Option[String]]): Long = {
    val rendered = keys.map {
      case Some(s) => s"${s.codePointCount(0, s.length)}:$s"
      case None => "-"
    }.mkString
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(
      rendered.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (0 until 7).foldLeft(0L)((acc, i) => (acc << 8) | (d(i) & 0xffL))
  }

  /** Fold two digest tables (disjoint batches, [[digest]]'s schema):
    * counts add, sums add (digit-string → DECIMAL(38,0) → digit
    * string), xors xor. Groups on one side pass through — an empty
    * delta is the identity. */
  def merge(a: DataFrame, b: DataFrame,
      groupCols: Seq[String]): DataFrame = {
    val grouped =
      if (groupCols.isEmpty) a.unionByName(b).groupBy()
      else a.unionByName(b).groupBy(groupCols.map(col): _*)
    grouped.agg(sum(col("n_rows")).as("n_rows"),
      sum(col("h_sum").cast("decimal(38,0)")).cast("string").as("h_sum"),
      call_function("bit_xor", col("h_xor")).as("h_xor"))
  }
}
