package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution drift between two corpus snapshots — the train/serving
  * skew monitor a recurring data pipeline runs next to [[CorpusDiff]]:
  * Population Stability Index per bucket,
  * `PSI_b = (p_b − q_b) · ln(p_b / q_b)` over reference and current
  * bucket shares (the standard model-monitoring drift score; the sum is
  * a symmetrized discrete KL). Shares are Laplace-smoothed with 0.5 per
  * bucket (`p_b = (n_b + 0.5) / (N + 0.5·B)`) so empty cells never
  * divide by zero or take `ln 0`, and every per-bucket contribution is
  * quantized ONCE to integer 1e-6 (floor half-up, the repo's L43 float
  * discipline) — totals are exact BIGINT sums, order-independent within
  * the engine; the oracle replays the identical expression tree
  * token-for-token. Cross-engine caveat (same as L43/L46's ln-in-floor
  * oracles, which have held across rounds): `ln` is libm-specified to
  * ~1 ulp, not correctly rounded, so a contribution landing within an
  * ulp of a .5 quantization boundary could read one off between
  * engines — accepted here exactly as in the established families.
  *
  * Scale shape: one partial-aggregated count per snapshot (output ≤ B
  * buckets each), a B-row full-outer join, a 1-row totals broadcast,
  * then narrow math — nothing scales with the corpus except the two
  * scans. Numeric drift uses CALLER-FROZEN uniform bin edges (frozen at
  * train time, exactly as production monitors do) so the binning is
  * data-independent — no quantile pass, no second scan. */
object Drift {

  private def smoothedPsi(j: DataFrame): DataFrame = {
    val tot = j.agg(sum(col("n_ref")).as("__tr"), sum(col("n_cur")).as("__tc"),
      count(lit(1)).as("__b"))
    // the one float surface: two smoothed shares and one ln, inside a
    // single half-up floor — replicated token-for-token by the oracle
    val p = (col("n_ref") + lit(0.5)) / (col("__tr") + lit(0.5) * col("__b"))
    val q = (col("n_cur") + lit(0.5)) / (col("__tc") + lit(0.5) * col("__b"))
    j.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        floor((p - q) * log(p / q) * lit(1000000.0) + lit(0.5))
          .cast("long").as("psi_e6"))
  }

  private def joinCounts(ref: DataFrame, cur: DataFrame,
      bucket: DataFrame => Column): DataFrame = {
    def cnt(df: DataFrame, n: String) =
      df.select(bucket(df).as("bucket")).filter(col("bucket").isNotNull)
        .groupBy(col("bucket")).agg(count(lit(1)).as(n))
    cnt(ref, "n_ref").join(cnt(cur, "n_cur"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
  }

  /** Categorical drift: one row per category with both counts and the
    * quantized PSI contribution; `sum(psi_e6)` is the headline score
    * (rule of thumb: total PSI < 0.1 stable, > 0.25 shifted). */
  def categorical(ref: DataFrame, cur: DataFrame, keyCol: String): DataFrame =
    smoothedPsi(joinCounts(ref, cur, df => df.col(keyCol)))

  // ---- integer log-table PSI (r14, L151; VERDICT r13 #5) ------------

  /** ln 2 at 1e-9, from StrictMath (platform-pinned, unlike the
    * intrinsic Math.log) — the exponent step of [[lnE9]]. */
  private[graft] val Ln2E9: Long =
    Math.round(StrictMath.log(2.0) * 1e9)

  /** The 256-cell mantissa table: `MantissaLnE9(i) = round(10⁹ ·
    * ln(1 + i/256))`. Generated ONCE from StrictMath (bit-identical on
    * every JVM/platform, the reproducibility contract Math.log's
    * CPU-dependent intrinsic cannot give) and consumed as literal
    * integers by BOTH engines — the oracle generator embeds these very
    * values, so the comparison is exact, no libm caveat. */
  private[graft] val MantissaLnE9: Seq[Long] =
    (0 until 256).map(i => Math.round(StrictMath.log(1.0 + i / 256.0) * 1e9))

  /** Categorical PSI with a FIXED-POINT table logarithm (r14, L151) —
    * closes [[categorical]]'s documented cross-engine caveat (the
    * libm-ulp-at-a-quantization-boundary class accepted there and in
    * L43/L46): every quantity here is an integer the oracle replays
    * exactly, so a hash mismatch can only ever be a real bug, never a
    * rounding accident. The price is a DEFINED approximation: ln is
    * evaluated as `k·ln2 + T[⌊256(m−1)⌋]` after the exact range
    * reduction `x = m·2^k, m ∈ [1,2)` — the table floors the mantissa
    * cell, so each per-bucket term is within ~4·10⁻³ nats of the true
    * PSI term (spec-measured against the float path), deterministic
    * and engine-portable. Table-PSI is its own documented statistic,
    * not an estimate that drifts.
    *
    * Integer construction: shares are Laplace-smoothed KEEPING
    * integrality — `p = (2n_ref+1)/(2N_ref+B)` (doubling replaces the
    * float 0.5) — so the ratio p/q is the exact LONG rational
    * `num/den = (2n_ref+1)(2N_cur+B) / ((2n_cur+1)(2N_ref+B))`; the
    * range reduction finds k from binary lengths (`bin()` on both
    * engines) plus one exact compare, the scaled operands are bounded
    * by 2^64 BY CONSTRUCTION (m < 2 ⇒ scaled num < 2·scaled den), and
    * the contribution is the one quantization
    * `psi_e9 = div((num − den)·lnE9, D1·D2)` — non-negative by sign
    * agreement (num−den and ln share sign; a ratio inside the first
    * table cell contributes exactly 0). Capacity: num = (2n+1)(2N+B)
    * must fit a LONG ⇒ per-cohort rows ≤ ~1.4·10⁹ (documented bound,
    * the Agreement/RankTest convention; shard-and-sum beyond).
    *
    * Scale shape identical to [[categorical]]: two partial-aggregated
    * bucket counts, a B-row outer join, a 1-row broadcast, narrow
    * integer math. */
  def categoricalExact(ref: DataFrame, cur: DataFrame,
      keyCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val j = joinCounts(ref, cur, df => df.col(keyCol))
    val tot = j.agg(sum(col("n_ref")).as("__tr"),
      sum(col("n_cur")).as("__tc"), count(lit(1)).as("__b"))
    def pow2(e: Column): Column =
      pow(lit(2.0), e.cast("double")).cast(d38)
    val d1 = lit(2L) * col("__tr") + col("__b")
    val d2 = lit(2L) * col("__tc") + col("__b")
    val num = (lit(2L) * col("n_ref") + 1L) * d2
    val den = (lit(2L) * col("n_cur") + 1L) * d1
    val k0 = (length(bin(col("__num"))) - length(bin(col("__den"))))
      .cast("long")
    val withK0 = j.crossJoin(broadcast(tot))
      .withColumn("__num", num).withColumn("__den", den)
      .withColumn("__d1", d1).withColumn("__d2", d2)
      .withColumn("__k0", k0)
    val sn0 = col("__num").cast(d38) * pow2(greatest(-col("__k0"), lit(0L)))
    val sd0 = col("__den").cast(d38) * pow2(greatest(col("__k0"), lit(0L)))
    val withK = withK0.withColumn("__k",
      when(sn0 < sd0, col("__k0") - 1L).otherwise(col("__k0")))
    val sn = col("__num").cast(d38) * pow2(greatest(-col("__k"), lit(0L)))
    val sd = col("__den").cast(d38) * pow2(greatest(col("__k"), lit(0L)))
    val mi = call_function("div", sn * lit(256L).cast(d38), sd) - 256L
    val lnE9 = col("__k") * Ln2E9 +
      element_at(typedlit(MantissaLnE9), col("__mi").cast("int") + 1)
    withK.withColumn("__mi", mi)
      .withColumn("__ln_e9", lnE9)
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        call_function("div",
          (col("__num") - col("__den")).cast(d38) * col("__ln_e9").cast(d38),
          col("__d1").cast(d38) * col("__d2").cast(d38)).as("psi_e9"))
  }

  /** The DuckDB replay of [[categoricalExact]] — generated WITH-chain
    * over `refSql`/`curSql` (each a SELECT yielding one `bucket`
    * column), embedding the SAME [[MantissaLnE9]] integers, `bin()`
    * lengths, exact compare, and `//` quantization. Kept beside the
    * operator so table and replay cannot drift apart. */
  def categoricalExactOracleSql(refSql: String, curSql: String): String = {
    val table = MantissaLnE9.mkString("[", ",", "]")
    s"""(WITH rr AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n
              FROM ($refSql) GROUP BY bucket),
          cc AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n
              FROM ($curSql) GROUP BY bucket),
          j AS (SELECT COALESCE(rr.bucket, cc.bucket) AS bucket,
                COALESCE(rr.n, 0) AS n_ref, COALESCE(cc.n, 0) AS n_cur
              FROM rr FULL OUTER JOIN cc ON cc.bucket = rr.bucket),
          t AS (SELECT SUM(n_ref) AS tr, SUM(n_cur) AS tc,
                COUNT(*) AS b FROM j),
          x AS (SELECT j.*, 2 * tr + b AS d1, 2 * tc + b AS d2,
                (2 * n_ref + 1) * (2 * tc + b) AS num,
                (2 * n_cur + 1) * (2 * tr + b) AS den
              FROM j CROSS JOIN t),
          k0 AS (SELECT *, CAST(LENGTH(bin(num)) - LENGTH(bin(den))
                AS BIGINT) AS kz FROM x),
          kk AS (SELECT *, CASE WHEN
                CAST(num AS HUGEINT)
                  * CAST(power(2, GREATEST(-kz, 0)) AS HUGEINT)
                < CAST(den AS HUGEINT)
                  * CAST(power(2, GREATEST(kz, 0)) AS HUGEINT)
                THEN kz - 1 ELSE kz END AS k FROM k0),
          m AS (SELECT *,
                (CAST(num AS HUGEINT)
                   * CAST(power(2, GREATEST(-k, 0)) AS HUGEINT) * 256)
                // (CAST(den AS HUGEINT)
                   * CAST(power(2, GREATEST(k, 0)) AS HUGEINT)) - 256
                AS mi FROM kk),
          l AS (SELECT *, k * ${Ln2E9}
                + ($table)[CAST(mi AS INT) + 1] AS ln_e9 FROM m)
         SELECT bucket, n_ref, n_cur,
                CAST((CAST(num AS HUGEINT) - den) * ln_e9
                  // (CAST(d1 AS HUGEINT) * d2) AS BIGINT) AS psi_e9
         FROM l)"""
  }

  /** Numeric drift over `nBins` uniform bins frozen at `[lo, hi)`:
    * bucket −1 catches underflow, `nBins` overflow, so the index is
    * total and the two snapshots always bin identically. */
  def numericUniform(ref: DataFrame, cur: DataFrame, valueCol: String,
      lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins > 0, s"nBins $nBins must be positive")
    require(lo < hi, s"empty bin range [$lo, $hi)")
    val step = (hi - lo) / nBins
    def bucket(df: DataFrame): Column = {
      val v = df.col(valueCol).cast("double")
      when(v.isNull, lit(null))
        .when(v < lo, lit(-1))
        .when(v >= hi, lit(nBins))
        // least-clamp: for v just under hi the float division can round
        // to exactly nBins, which must stay a distinct overflow bucket
        .otherwise(least(floor((v - lit(lo)) / lit(step)),
          lit((nBins - 1).toLong)).cast("int"))
    }
    smoothedPsi(joinCounts(ref, cur, bucket))
  }

  // ---- table-exact Jensen–Shannon divergence (r14, L159) -------------

  /** Appends `<pre>ln` = the table logarithm (1e-9 nats) of the
    * positive LONG rational `<pre>num` / `<pre>den` — the SAME L151
    * range reduction [[categoricalExact]] runs inline (exact `bin()`
    * length probe, one exact compare, floored 256-cell mantissa
    * lookup), factored on a column-name prefix so one frame can carry
    * several logarithms. Operands must be positive and < 2⁶³ (callers
    * document their capacity bound). */
  private[operators] def withTableLn(df: DataFrame, pre: String): DataFrame = {
    val d38 = "decimal(38,0)"
    def pow2(e: Column): Column =
      pow(lit(2.0), e.cast("double")).cast(d38)
    val num = col(pre + "num"); val den = col(pre + "den")
    val w0 = df.withColumn(pre + "k0",
      (length(bin(num)) - length(bin(den))).cast("long"))
    val sn0 = num.cast(d38) * pow2(greatest(-col(pre + "k0"), lit(0L)))
    val sd0 = den.cast(d38) * pow2(greatest(col(pre + "k0"), lit(0L)))
    val wk = w0.withColumn(pre + "k",
      when(sn0 < sd0, col(pre + "k0") - 1L).otherwise(col(pre + "k0")))
    val sn = num.cast(d38) * pow2(greatest(-col(pre + "k"), lit(0L)))
    val sd = den.cast(d38) * pow2(greatest(col(pre + "k"), lit(0L)))
    wk.withColumn(pre + "mi",
        call_function("div", sn * lit(256L).cast(d38), sd) - 256L)
      .withColumn(pre + "ln", col(pre + "k") * Ln2E9 +
        element_at(typedlit(MantissaLnE9), col(pre + "mi").cast("int") + 1))
  }

  /** Jensen–Shannon divergence with the L151 fixed-point table
    * logarithm (r14, L159; Lin 1991, IEEE IT 37) — the BOUNDED,
    * SYMMETRIC member of the drift panel: PSI grows without bound on
    * disjoint support and reads asymmetric smoothing artifacts; JSD =
    * ½Σp·ln(p/m) + ½Σq·ln(q/m), m = (p+q)/2, never exceeds ln 2, so
    * panel thresholds stay comparable across corpora. Third consumer
    * of [[MantissaLnE9]].
    *
    * Integer construction on top of [[categoricalExact]]'s smoothed
    * shares p = (2n_ref+1)/D1, q = (2n_cur+1)/D2 (D1 = 2N_ref+B,
    * D2 = 2N_cur+B): with num_p = (2n_ref+1)·D2 and
    * num_q = (2n_cur+1)·D1,
    *   p/m = 2·num_p/(num_p+num_q),  q/m = 2·num_q/(num_p+num_q)
    * are exact LONG rationals sharing one denominator, and the
    * per-bucket contribution is ONE quantization
    *   jsd_e9 = div(num_p·ln(p/m)_e9 + num_q·ln(q/m)_e9, 2·D1·D2).
    * Approximation bound — DIFFERENT from PSI's, stated precisely:
    * both table-lns floor toward −∞ by ε_b ∈ [0, ln(257/256)), and
    * here the error multiplies p and q THEMSELVES (PSI's multiplies
    * the small p−q), so the reading is true − Σ_b ((p_b+q_b)/2)·ε_b.
    * Because Σp = Σq = 1, the TOTAL under-read is bounded by
    * ln(257/256) ≈ 3.9·10⁻³ nats regardless of bucket count — a
    * near-identical pair can read up to ~3.9·10⁶ e9-units NEGATIVE
    * (measured −1.4·10⁶ on the gate's A/A pair). Stated, not clamped
    * (the Diversity stance: a clamp would hide exactly the near-zero
    * reads the panel watches); drift thresholds live orders of
    * magnitude above the floor (0.175 nats on the gate's skew pair).
    * Identical counts hit mantissa cell 0 on both lns and read an
    * EXACT 0. Capacity: 2·num_p must stay inside a LONG for the
    * `bin()` probe ⇒ per-cohort rows ≤ ~7·10⁸ (half the PSI bound —
    * the extra doubling; shard-and-sum beyond).
    *
    * Scale shape identical to [[categoricalExact]]: two
    * partial-aggregated bucket counts, a B-row outer join, a 1-row
    * broadcast, narrow integer math — nothing corpus-shaped past the
    * two scans. */
  def jensenShannonExact(ref: DataFrame, cur: DataFrame,
      keyCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val j = joinCounts(ref, cur, df => df.col(keyCol))
    val tot = j.agg(sum(col("n_ref")).as("__tr"),
      sum(col("n_cur")).as("__tc"), count(lit(1)).as("__b"))
    val d1 = lit(2L) * col("__tr") + col("__b")
    val d2 = lit(2L) * col("__tc") + col("__b")
    val base = j.crossJoin(broadcast(tot))
      .withColumn("__np", (lit(2L) * col("n_ref") + 1L) * d2)
      .withColumn("__nq", (lit(2L) * col("n_cur") + 1L) * d1)
      .withColumn("__d1", d1).withColumn("__d2", d2)
      .withColumn("__pnum", lit(2L) * col("__np"))
      .withColumn("__pden", col("__np") + col("__nq"))
      .withColumn("__qnum", lit(2L) * col("__nq"))
      .withColumn("__qden", col("__np") + col("__nq"))
    withTableLn(withTableLn(base, "__p"), "__q")
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        call_function("div",
          col("__np").cast(d38) * col("__pln").cast(d38)
            + col("__nq").cast(d38) * col("__qln").cast(d38),
          lit(2L).cast(d38) * col("__d1").cast(d38)
            * col("__d2").cast(d38)).as("jsd_e9"))
  }

  /** JVM mirror of the table-ln column chain — the streaming twin's
    * scoring fold (the Manifest.rowHashJvm convention: one mirror in
    * main, spec-pinned bit-for-bit against the expression path so the
    * twins cannot drift). Same contract: positive operands, floored
    * 256-cell mantissa. */
  private[graft] def lnE9Jvm(num: BigInt, den: BigInt): Long = {
    require(num > 0 && den > 0, s"lnE9Jvm needs positive operands")
    var k = num.bitLength - den.bitLength
    def sn(kk: Int) = if (kk >= 0) num else num << -kk
    def sd(kk: Int) = if (kk >= 0) den << kk else den
    if (sn(k) < sd(k)) k -= 1
    val mi = (sn(k) * 256 / sd(k) - 256).toInt
    k.toLong * Ln2E9 + MantissaLnE9(mi)
  }

  /** JVM mirror of [[categoricalExact]] over explicit bucket counts:
    * (bucket, n_ref, n_cur, psi_e9) rows, sorted by bucket. Buckets
    * absent on one side enter with count 0 (the outer-join
    * convention). */
  private[graft] def tablePsiJvm(ref: Map[Long, Long],
      cur: Map[Long, Long]): Seq[(Long, Long, Long, Long)] = {
    val buckets = (ref.keySet ++ cur.keySet).toSeq.sorted
    val tr = BigInt(ref.values.sum); val tc = BigInt(cur.values.sum)
    val b = BigInt(buckets.size)
    val d1 = 2 * tr + b; val d2 = 2 * tc + b
    buckets.map { k =>
      val nr = ref.getOrElse(k, 0L); val nc = cur.getOrElse(k, 0L)
      val num = (BigInt(2) * nr + 1) * d2
      val den = (BigInt(2) * nc + 1) * d1
      (k, nr, nc, ((num - den) * lnE9Jvm(num, den) / (d1 * d2)).toLong)
    }
  }

  /** JVM mirror of [[jensenShannonExact]] over explicit bucket
    * counts: (bucket, n_ref, n_cur, jsd_e9) rows, sorted. */
  private[graft] def tableJsdJvm(ref: Map[Long, Long],
      cur: Map[Long, Long]): Seq[(Long, Long, Long, Long)] = {
    val buckets = (ref.keySet ++ cur.keySet).toSeq.sorted
    val tr = BigInt(ref.values.sum); val tc = BigInt(cur.values.sum)
    val b = BigInt(buckets.size)
    val d1 = 2 * tr + b; val d2 = 2 * tc + b
    buckets.map { k =>
      val nr = ref.getOrElse(k, 0L); val nc = cur.getOrElse(k, 0L)
      val np = (BigInt(2) * nr + 1) * d2
      val nq = (BigInt(2) * nc + 1) * d1
      val pln = lnE9Jvm(2 * np, np + nq)
      val qln = lnE9Jvm(2 * nq, np + nq)
      (k, nr, nc, ((np * pln + nq * qln) / (2 * d1 * d2)).toLong)
    }
  }

  /** The DuckDB replay of [[jensenShannonExact]] — the
    * [[categoricalExactOracleSql]] convention: generated WITH-chain
    * embedding the same [[MantissaLnE9]] literals, both ln chains, and
    * the one `//` quantization. Kept beside the operator so table and
    * replay cannot drift apart. */
  def jensenShannonExactOracleSql(refSql: String, curSql: String): String = {
    val table = MantissaLnE9.mkString("[", ",", "]")
    def lnChain(p: String) =
      s"""${p}kk AS (SELECT *, CASE WHEN
                CAST(${p}num AS HUGEINT)
                  * CAST(power(2, GREATEST(-${p}kz, 0)) AS HUGEINT)
                < CAST(${p}den AS HUGEINT)
                  * CAST(power(2, GREATEST(${p}kz, 0)) AS HUGEINT)
                THEN ${p}kz - 1 ELSE ${p}kz END AS ${p}k
              FROM ${if (p == "p") "k0" else "pl"}),
          ${p}m AS (SELECT *,
                (CAST(${p}num AS HUGEINT)
                   * CAST(power(2, GREATEST(-${p}k, 0)) AS HUGEINT) * 256)
                // (CAST(${p}den AS HUGEINT)
                   * CAST(power(2, GREATEST(${p}k, 0)) AS HUGEINT)) - 256
                AS ${p}mi FROM ${p}kk),
          ${p}l AS (SELECT *, ${p}k * ${Ln2E9}
                + ($table)[CAST(${p}mi AS INT) + 1] AS ${p}ln
              FROM ${p}m)"""
    s"""(WITH rr AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n
              FROM ($refSql) GROUP BY bucket),
          cc AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n
              FROM ($curSql) GROUP BY bucket),
          j AS (SELECT COALESCE(rr.bucket, cc.bucket) AS bucket,
                COALESCE(rr.n, 0) AS n_ref, COALESCE(cc.n, 0) AS n_cur
              FROM rr FULL OUTER JOIN cc ON cc.bucket = rr.bucket),
          t AS (SELECT SUM(n_ref) AS tr, SUM(n_cur) AS tc,
                COUNT(*) AS b FROM j),
          x AS (SELECT j.*, 2 * tr + b AS d1, 2 * tc + b AS d2,
                (2 * n_ref + 1) * (2 * tc + b) AS np,
                (2 * n_cur + 1) * (2 * tr + b) AS nq
              FROM j CROSS JOIN t),
          k0 AS (SELECT *,
                CAST(LENGTH(bin(2 * np)) - LENGTH(bin(np + nq))
                  AS BIGINT) AS pkz,
                CAST(LENGTH(bin(2 * nq)) - LENGTH(bin(np + nq))
                  AS BIGINT) AS qkz,
                2 * np AS pnum, np + nq AS pden,
                2 * nq AS qnum, np + nq AS qden
              FROM x),
          ${lnChain("p")},
          ${lnChain("q")}
         SELECT bucket, n_ref, n_cur,
                CAST((CAST(np AS HUGEINT) * pln + CAST(nq AS HUGEINT)
                    * qln)
                  // (2 * CAST(d1 AS HUGEINT) * d2) AS BIGINT) AS jsd_e9
         FROM ql)"""
  }
}
