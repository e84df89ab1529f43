package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi:
  * Optimizing Data Mixtures Speeds Up Language Model Pretraining",
  * arXiv:2305.10429) — the OFFLINE, static-loss variant: domain weights
  * updated by exponentiated gradient on each domain's EXCESS loss
  * (its mean NLL above the corpus baseline), smoothed toward uniform
  * each round, then turned into a token allocation. DoReMi proper
  * interleaves the update with proxy-model training (losses move every
  * step); this operator is the deterministic fixed-point of that loop
  * for a FIXED loss table — the honest engine-side form, since a
  * training loop is a trainer concern, and exactly what a curation
  * pipeline runs when the proxy losses arrive as a table. Documented
  * deviation, same stance as L93's open-vocabulary guard.
  *
  * The loss is the battery's own integer perplexity surface: per-doc
  * (n_bigrams, nll_e4) from [[LmScore.bigramPerplexity]] (self-trained
  * add-one — already oracle-shared), aggregated per domain;
  * mean_nll_e4 and the corpus baseline are exact floor divisions, and
  * excess = max(mean − baseline, 0).
  *
  * Exactness (quantize-once + exact-rational): the ONLY float in the
  * whole operator is one `exp((η_e6/10⁶)·(excess_e4/10⁴))` per domain,
  * quantized immediately to the integer multiplier `mult_e6` — the
  * L43 discipline; every round after that is integer arithmetic on the
  * 1e-6 weight grid: raw = w·mult, Hamilton largest-remainder
  * renormalization to Σ = 10⁶ (the L50/L116 allocation machinery —
  * remainder DESC, domain ASC ties), uniform smoothing
  * w ← ((10⁶−c)·w' + c·u) div 10⁶ with u the Hamilton-uniform vector.
  * Driver arithmetic runs in BigInt (exact, no overflow reasoning
  * needed); the oracle replays the identical recurrence in HUGEINT.
  *
  * Scale shape: the corpus pays ONE perplexity scoring pass (L43's
  * shape — model fit + per-position join); everything after is a
  * |domains|-row grid — collected to the driver under the
  * [[MaxDomains]] require (the BradleyTerry/RecordLinkage bounded-grid
  * class; a pretraining mix has tens-to-thousands of domains), rounds
  * are driver loops with zero Spark jobs, and the result materializes
  * as a LocalTableScan (plan-pinned). */
object Doremi {

  /** Max domains collected to the driver. */
  val MaxDomains = 10000

  /** Hamilton largest-remainder allocation of `total` proportional to
    * `weights` (BigInt-exact): base share by floor, leftover units to
    * the largest remainders, ties by ascending index. Shared with
    * [[Transitions.stationary]] (r12) — one allocation algebra, one
    * oracle form. */
  private[operators] def hamilton(weights: Seq[BigInt],
      total: BigInt): Seq[BigInt] = {
    val s = weights.sum
    require(s > 0, "allocation needs positive total weight")
    val base = weights.map(w => w * total / s)
    val rem = weights.map(w => (w * total) % s)
    val leftover = (total - base.sum).toInt
    val seats = rem.zipWithIndex
      .sortBy { case (r, i) => (-r, i) }
      .take(leftover).map(_._2).toSet
    base.zipWithIndex.map { case (b, i) =>
      b + (if (seats(i)) BigInt(1) else BigInt(0))
    }
  }

  /** (groupCol, n_grams, mean_nll_e4, excess_e4, mult_e6, weight_e6,
    * alloc) — one row per domain with ≥ 1 scoreable bigram, ordered by
    * the caller. `etaE6` is the step size η in 1e-6 units per nat of
    * excess, `smoothingE6` the uniform-smoothing mass c in 1e-6 units,
    * `budget` the token budget the final weights allocate. */
  def weights(df: DataFrame, groupCol: String, idCol: String,
      textCol: String, etaE6: Long = 100000L, smoothingE6: Long = 200000L,
      rounds: Int = 4, budget: Long = 1000000L): DataFrame = {
    require(etaE6 >= 1L && etaE6 <= 10000000L,
      s"etaE6 $etaE6 outside [1, 1e7]")
    require(smoothingE6 >= 0L && smoothingE6 < 1000000L,
      s"smoothingE6 $smoothingE6 outside [0, 1e6)")
    require(rounds >= 1 && rounds <= 100, s"rounds $rounds outside [1, 100]")
    require(budget >= 1L, s"budget $budget must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val perDoc = LmScore.bigramPerplexity(df, idCol, textCol)
    val grid = BoundedGrid.collectBounded(
      df.select(col(idCol).as("__did"),
          col(groupCol).cast("string").as("__g"))
        .filter(col("__g").isNotNull)
        .join(perDoc.select(col(idCol).as("__did"), col("n_bigrams"),
          col("nll_e4")), Seq("__did"))
        .groupBy(col("__g"))
        .agg(sum(col("n_bigrams")).as("n"), sum(col("nll_e4")).as("nll"))
        .filter(col("n") > 0),
      MaxDomains, "domain grid",
      "a mixture grid should be domain-sized; aggregate sources first")
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    if (grid.isEmpty) {
      return Seq.empty[(String, Long, Long, Long, Long, Long, Long)]
        .toDF(groupCol, "n_grams", "mean_nll_e4", "excess_e4", "mult_e6",
          "weight_e6", "alloc")
    }
    val totalN = grid.map(_._2).sum
    val totalNll = grid.map(_._3).sum
    val baseline = totalNll / totalN // exact floor, nonnegative
    val mean = grid.map(g => g._3 / g._2)
    val excess = mean.map(m => math.max(m - baseline, 0L))
    excess.foreach(e => require(etaE6 / 1000000.0 * (e / 10000.0) <= 27.0,
      s"eta*excess ${etaE6 / 1000000.0 * (e / 10000.0)} exceeds 27 nats — " +
        "the quantized multiplier would overflow BIGINT on the oracle " +
        "side; lower etaE6"))
    // the one float per domain, quantized once (the L43 discipline)
    val mult = excess.map(e => math.floor(
      math.exp(etaE6 / 1000000.0 * (e / 10000.0)) * 1000000.0 + 0.5).toLong)
    val k = grid.length
    val M = BigInt(1000000)
    val u = hamilton(Seq.fill(k)(BigInt(1)), M)
    var w = u
    for (_ <- 1 to rounds) {
      val raw = w.zip(mult).map { case (wi, mi) => wi * BigInt(mi) }
      val norm = hamilton(raw, M)
      w = norm.zip(u).map { case (ni, ui) =>
        ((M - smoothingE6) * ni + BigInt(smoothingE6) * ui) / M
      }
    }
    val finalW = hamilton(w, M)
    val alloc = hamilton(finalW, BigInt(budget))
    grid.indices.map { i =>
      (grid(i)._1, grid(i)._2, mean(i), excess(i), mult(i),
        finalW(i).toLong, alloc(i).toLong)
    }.toDF(groupCol, "n_grams", "mean_nll_e4", "excess_e4", "mult_e6",
      "weight_e6", "alloc")
  }

  /** GENERATED DuckDB replay of [[weights]] (the IvfPq/RecordLinkage
    * oracle discipline — engine and oracle share (η, c, rounds,
    * budget), so the recurrence and its oracle cannot drift).
    * `pplCtes` must be a CTE chain yielding `ppl(doc_id, n_bigrams,
    * nll_e4, …)` — the battery passes its shared add-one macro. The
    * unrolled rounds run the identical integer recurrence in HUGEINT:
    * raw = w·mult, Hamilton renormalization (remainder DESC, domain
    * ASC), uniform smoothing. */
  def oracleSql(pplCtes: String, groupExpr: String, etaE6: Long,
      smoothingE6: Long, rounds: Int, budget: Long): String = {
    val c = smoothingE6
    // one Hamilton round over the grid: weights in column `w` of the
    // previous CTE → normalized-and-smoothed weights in `w` again
    def round(prev: String, name: String): String =
      s"""$name AS (
           SELECT g, n, mean_nll, excess, mult, k, rn, u,
             CAST((CAST(${1000000L - c} AS HUGEINT) * norm
                   + CAST($c AS HUGEINT) * u) // 1000000 AS BIGINT) AS w
           FROM (
             SELECT *, base + CASE WHEN ROW_NUMBER()
                 OVER (ORDER BY rem DESC, g) <= lo THEN 1 ELSE 0 END
               AS norm
             FROM (
               SELECT *, 1000000 - SUM(base) OVER () AS lo
               FROM (
                 SELECT *, CAST(raw * 1000000 // s AS BIGINT) AS base,
                        (raw * 1000000) % s AS rem
                 FROM (SELECT *, CAST(w AS HUGEINT) * mult AS raw,
                         SUM(CAST(w AS HUGEINT) * mult) OVER () AS s
                       FROM $prev) rw) bs) lf) nm)"""
    val roundCtes = (1 to rounds).map(r =>
      round(if (r == 1) "w0" else s"w${r - 1}", s"w$r")).mkString(",\n")
    // final Hamilton over a plain weight column (no mult, no smoothing)
    def finalHamilton(prev: String, name: String, total: Long,
        outCol: String): String =
      s"""$name AS (
           SELECT *, CAST(base + CASE WHEN ROW_NUMBER()
               OVER (ORDER BY rem DESC, g) <= lo THEN 1 ELSE 0 END
             AS BIGINT) AS $outCol
           FROM (
             SELECT *, $total - SUM(base) OVER () AS lo
             FROM (
               SELECT *, CAST(CAST(w AS HUGEINT) * $total // s AS BIGINT)
                      AS base,
                      (CAST(w AS HUGEINT) * $total) % s AS rem
               FROM (SELECT *, SUM(CAST(w AS HUGEINT)) OVER () AS s
                     FROM $prev) rw) bs) lf)"""
    s"""WITH $pplCtes,
        srcagg AS (SELECT CAST($groupExpr AS VARCHAR) AS g,
                     CAST(SUM(p.n_bigrams) AS BIGINT) AS n,
                     CAST(SUM(p.nll_e4) AS BIGINT) AS nll
                   FROM documents d JOIN ppl p USING (doc_id)
                   WHERE $groupExpr IS NOT NULL
                   GROUP BY 1 HAVING SUM(p.n_bigrams) > 0),
        tot AS (SELECT CAST(SUM(nll) // SUM(n) AS BIGINT) AS baseline
                FROM srcagg),
        grid AS (SELECT g, n, CAST(nll // n AS BIGINT) AS mean_nll,
                   CAST(GREATEST(nll // n - tot.baseline, 0) AS BIGINT)
                     AS excess
                 FROM srcagg, tot),
        m AS (SELECT g, n, mean_nll, excess,
                CAST(floor(exp($etaE6 / 1000000.0 * (excess / 10000.0))
                  * 1000000.0 + 0.5) AS BIGINT) AS mult,
                CAST(COUNT(*) OVER () AS BIGINT) AS k,
                ROW_NUMBER() OVER (ORDER BY g) AS rn
              FROM grid),
        w0 AS (SELECT *,
                 CAST(1000000 // k + CASE WHEN rn <= 1000000 % k
                   THEN 1 ELSE 0 END AS BIGINT) AS u,
                 CAST(1000000 // k + CASE WHEN rn <= 1000000 % k
                   THEN 1 ELSE 0 END AS BIGINT) AS w
               FROM m),
        $roundCtes,
        ${finalHamilton(s"w$rounds", "wf", 1000000L, "weight_e6")},
        ${finalHamilton(
          "(SELECT g, n, mean_nll, excess, mult, weight_e6, " +
            "weight_e6 AS w FROM wf)", "al", budget, "alloc")}
       SELECT g AS source, n AS n_grams, mean_nll AS mean_nll_e4,
              excess AS excess_e4, mult AS mult_e6, weight_e6, alloc
       FROM al ORDER BY source"""
  }
}
