package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random-projection audit (Johnson &
  * Lindenstrauss 1984; Achlioptas 2003 database-friendly ±1 form) —
  * the dimensionality-reduction twin of L101's Matryoshka audit: MRL
  * truncation needs retrained embeddings, a Rademacher projection works
  * on ANY embedding column. `y = Sx` with `S ∈ {±1}^{k×d}`, estimator
  * `‖Sx−Sy‖²/k ≈ ‖x−y‖²`; the audit measures the per-pair distortion
  * ratio on a bounded pair set before anyone serves the projected
  * index.
  *
  * Determinism: the sign matrix derives from md5 — dimension d's row
  * key is `md5("<seed>-<d>")`, target dim j reads hex digit j (odd
  * digit → −1) — so BOTH engines recompute the matrix from the seed
  * (the L47 md5-derivation discipline; nothing rides as literals).
  * Projection and distances accumulate left-to-right in double (the
  * DotProduct fold contract, bitwise equal to DuckDB's `list_sum`),
  * and the single ratio division quantizes once to 1e-6.
  *
  * Scale shape: projection is a native codegen loop over a referenced
  * sign matrix ([[graft.expressions.JlProject]] — k·d multiply-adds per
  * row, no HOF, no join), output k doubles per row: the corpus-scale
  * path 100 TB would actually run (and 8× narrower storage at k=16
  * from 64 floats). The AUDIT is the bounded measurement over the
  * fixed pair set, exactly like L101's bounded query sets. */
object JlAudit {

  /** signs(j)(d) ∈ {+1, −1}: hex digit j (0-based) of md5("seed-d"),
    * odd → −1. k ≤ 32 (one md5 row per source dimension). */
  def signs(seed: String, dims: Int, k: Int): Array[Array[Byte]] = {
    require(k >= 1 && k <= 32, s"k must be in [1, 32] (md5 hex row), got $k")
    require(dims >= 1, s"dims must be positive, got $dims")
    val md = MessageDigest.getInstance("MD5")
    val rows = (0 until dims).map { d =>
      md.reset()
      val hex = md.digest(s"$seed-$d".getBytes(StandardCharsets.UTF_8))
        .map(b => f"$b%02x").mkString
      (0 until k).map { j =>
        if (Character.digit(hex.charAt(j), 16) % 2 == 1) (-1).toByte
        else 1.toByte
      }.toArray
    }
    // transpose to (j)(d) — the projection loop iterates target dims
    (0 until k).map(j => (0 until dims).map(d => rows(d)(j)).toArray).toArray
  }

  /** `array<float>` → `array<double>` of k projected components. */
  def project(v: Column, seed: String, dims: Int, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expressions.JlProject(
        org.apache.spark.sql.GraftBridge.expression(v), signs(seed, dims, k)))

  /** Squared L2 distance (float or double arrays, same type both
    * sides). */
  def l2sq(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expressions.L2DistSq(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  /** Per-pair distortion over all id pairs of `vectors` (caller bounds
    * the set): `(id_a, id_b, dist_full6, dist_proj6, ratio_e6)` where
    * `ratio = (‖Sa−Sb‖²/k) / ‖a−b‖²` (NULL for coincident vectors). */
  def distortionPairs(vectors: DataFrame, idCol: String, vecCol: String,
      seed: String, dims: Int, k: Int): DataFrame = {
    val p = vectors
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        project(col(vecCol), seed, dims, k).as("pv"))
    val pairs = p.as("a").join(broadcast(p.as("b")),
      col("a.id") < col("b.id"))
    val fullSq = l2sq(col("a.v"), col("b.v"))
    val projSq = l2sq(col("a.pv"), col("b.pv"))
    pairs.select(col("a.id").as("id_a"), col("b.id").as("id_b"),
      round(fullSq, 6).as("dist_full6"),
      round(projSq, 6).as("dist_proj6"),
      when(fullSq === 0.0, lit(null).cast("long"))
        .otherwise(floor((projSq / lit(k.toDouble)) / fullSq
          * lit(1000000.0) + lit(0.5)).cast("long")).as("ratio_e6"))
  }
}
