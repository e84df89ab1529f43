package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bradley–Terry preference-strength fitting (Bradley & Terry 1952;
  * Hunter 2004 MM algorithm) — the model behind pairwise human-
  * preference data: P(i beats j) = w_i / (w_i + w_j), fit from win
  * counts. In an LLM data stack this is the reward-model data-prep
  * step: aggregate raw pairwise judgments into per-item strengths (and
  * flag inconsistent item sets) before training on them.
  *
  * Fixed-round MM updates in scaled integers, synchronous per round:
  *   denom_i = Σ_j  n_ij · 10¹² DIV (w_i + w_j)     (w in 1e-6 units)
  *   w_i'    = W_i · 10¹² DIV denom_i
  * then renormalized to Σw = K·10⁶ and floored at 1 — floor division
  * on nonnegative longs everywhere, so a fixed round count yields the
  * IDENTICAL integer vector on any engine (the PageRank discipline)
  * and the oracle replays the unrolled rounds digit-for-digit.
  * Laplace smoothing λ adds λ wins in BOTH directions of every
  * OBSERVED pair (n_ij += 2λ, W_i += λ per opponent), which keeps every
  * W_i ≥ 1 and every MM denominator positive regardless of one-sided
  * records — the standard MAP regularization. Convergence needs the
  * usual strong-connectivity caveat; determinism (what the gate checks)
  * does not.
  *
  * Scale shape: the corpus collapses in ONE map-side-combinable
  * aggregation to the directed (winner, loser, n) grid — at most
  * items² rows, independent of comparison volume (the PCA/CMS
  * bounded-grid pattern: billions of judgments, a handful of arms).
  * Iterations are driver arithmetic on that grid — zero Spark jobs per
  * round. Capacity: W_i·10¹² must fit a long ⇒ ≲ 9.2e6 comparisons per
  * item at this scale; beyond, drop the multiplier to 10¹⁰ or fit per
  * shard and pool — same shapes. If ITEMS were corpus-scale (per-doc
  * ELO), the per-round join form (PageRank shape) applies instead —
  * documented trade, not this operator's regime. */
object BradleyTerry {

  /** Max (i, j) grid rows collected to the driver. */
  val MaxGridRows = 100000

  /** `(item, w_e6)` for every item appearing in ≥ 1 comparison, after
    * exactly `rounds` MM updates from the uniform start 10⁶. */
  def fit(comparisons: DataFrame, winnerCol: String, loserCol: String,
      rounds: Int = 10, lambda: Long = 1L): DataFrame = {
    require(rounds >= 1 && rounds <= 100,
      s"rounds must be in [1, 100], got $rounds")
    require(lambda >= 1L, s"lambda must be >= 1 (positivity), got $lambda")
    val spark = comparisons.sparkSession
    // ONE corpus-scale aggregation: directed win counts
    val dw = comparisons
      .select(col(winnerCol).cast("string").as("i"),
        col(loserCol).cast("string").as("j"))
      .filter(col("i").isNotNull && col("j").isNotNull && col("i") =!= col("j"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("n"))
    val grid = BoundedGrid.collectBounded(dw, MaxGridRows,
      "comparison grid (items² rows)",
      "use the per-round join form for corpus-scale item sets")
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    if (grid.isEmpty) {
      import spark.implicits._
      return Seq.empty[(String, Long)].toDF("item", "w_e6")
    }
    // undirected totals + smoothing; opponents per item
    val undirected = grid.groupBy { case (i, j, _) =>
      if (i < j) (i, j) else (j, i)
    }.map { case (k, vs) => k -> (vs.map(_._3).sum + 2L * lambda) }
    val items = grid.flatMap(g => Seq(g._1, g._2)).distinct.sorted
    val rawWins = grid.groupBy(_._1).map { case (i, vs) => i -> vs.map(_._3).sum }
    val opponents = items.map { i =>
      i -> undirected.keys.count(k => k._1 == i || k._2 == i).toLong
    }.toMap
    val bigW = items.map { i =>
      i -> (rawWins.getOrElse(i, 0L) + lambda * opponents(i))
    }.toMap
    // Both factors of the 10^12-scale products must fit a long:
    // bigW(i)·10¹² (numerator) and n·10¹² (per-pair denominator term)
    // overflow past ~9.2e6, so BOTH are bounded at 9.0e6 — not 9.0e9.
    bigW.foreach { case (i, w) =>
      require(w <= 9000000L,
        s"item $i has $w smoothed wins — beyond the 10^12-scale long " +
          "capacity (~9.2e6/item); drop the scale or fit per shard")
    }
    undirected.foreach { case ((a, b), n) =>
      require(n <= 9000000L,
        s"pair ($a, $b) has $n smoothed comparisons — beyond the " +
          "10^12-scale long capacity (~9.2e6/pair); drop the scale or " +
          "fit per shard")
    }
    // symmetric pair list with smoothed totals
    val pt: Seq[(String, String, Long)] = undirected.toSeq.flatMap {
      case ((a, b), n) => Seq((a, b, n), (b, a, n))
    }
    var w = items.map(_ -> 1000000L).toMap
    val k = items.length.toLong
    for (_ <- 1 to rounds) {
      val denom = pt.groupBy(_._1).map { case (i, es) =>
        i -> es.map { case (_, j, n) =>
          Math.floorDiv(n * 1000000000000L, w(i) + w(j))
        }.sum
      }
      val updated = items.map { i =>
        i -> Math.floorDiv(bigW(i) * 1000000000000L, denom(i))
      }.toMap
      val total = updated.values.sum
      w = updated.map { case (i, v) =>
        i -> math.max(1L, Math.floorDiv(v * k * 1000000L, total))
      }
    }
    import spark.implicits._
    items.map(i => (i, w(i))).toSeq.toDF("item", "w_e6")
  }

  /** Unrolled-round replay for DuckDB — expects an upstream CTE
    * `cmp(winner, loser)` with one row per comparison; emits the final
    * `SELECT item, w_e6 … ORDER BY item`. Generated from the SAME
    * (rounds, lambda) as [[fit]] so engine and oracle cannot drift.
    * CTEs are MATERIALIZED (the clusterOracle lesson: each round
    * references its predecessor twice). */
  private[graft] def oracleCtes(rounds: Int, lambda: Long): String = {
    val steps = (1 to rounds).map { r =>
      s"""t$r AS MATERIALIZED (
            SELECT pt.i,
                   CAST(SUM(pt.n * 1000000000000 // (wi.w + wj.w))
                        AS BIGINT) AS denom
            FROM pt
            JOIN w${r - 1} wi ON pt.i = wi.i
            JOIN w${r - 1} wj ON pt.j = wj.i
            GROUP BY pt.i),
          u$r AS MATERIALIZED (
            SELECT bw.i, (bw.wins * 1000000000000) // t$r.denom AS w
            FROM bw JOIN t$r ON bw.i = t$r.i),
          w$r AS MATERIALIZED (
            SELECT i, GREATEST(1, (w * (SELECT COUNT(*) FROM w0)
                                     * 1000000)
                                  // (SELECT SUM(w) FROM u$r)) AS w
            FROM u$r)"""
    }.mkString(",\n")
    s"""dw AS MATERIALIZED (
          SELECT winner AS i, loser AS j, CAST(COUNT(*) AS BIGINT) AS n
          FROM cmp WHERE winner IS NOT NULL AND loser IS NOT NULL
            AND winner <> loser
          GROUP BY 1, 2),
        up AS MATERIALIZED (
          SELECT least(i, j) AS a, greatest(i, j) AS b,
                 CAST(SUM(n) + ${2L * lambda} AS BIGINT) AS n
          FROM dw GROUP BY 1, 2),
        pt AS MATERIALIZED (
          SELECT a AS i, b AS j, n FROM up
          UNION ALL SELECT b AS i, a AS j, n FROM up),
        bw AS MATERIALIZED (
          SELECT it.i,
                 CAST(COALESCE(rw.wins, 0)
                      + $lambda * (SELECT COUNT(*) FROM pt WHERE pt.i = it.i)
                      AS BIGINT) AS wins
          FROM (SELECT DISTINCT i FROM pt) it
          LEFT JOIN (SELECT i, SUM(n) AS wins FROM dw GROUP BY i) rw
            ON it.i = rw.i),
        w0 AS MATERIALIZED (
          SELECT i, CAST(1000000 AS BIGINT) AS w FROM (SELECT DISTINCT i FROM pt)),
        $steps
       SELECT i AS item, CAST(w AS BIGINT) AS w_e6 FROM w$rounds
       ORDER BY item"""
  }
}
