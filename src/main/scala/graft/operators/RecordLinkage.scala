package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage with EM-fitted weights
  * (Fellegi & Sunter 1969; Winkler 1988; the model behind Splink) —
  * the entity-resolution step past L69's exact edit-distance matching:
  * candidate pairs reduce to field-agreement patterns γ ∈ {0,1}^F, and
  * EM fits the match proportion λ and per-field m/u probabilities
  * (P(agree | match) / P(agree | non-match)) with no labels; each
  * pattern's posterior match weight w_γ then drives link/review/reject
  * thresholds.
  *
  * Quantized-integer EM, synchronous per round (the PageRank/BT
  * determinism discipline — probabilities in 1e-6 units, every step a
  * floor division on nonnegative longs, clamps to [1, 999999] for the
  * standard degeneracy guard):
  *   E: pm_γ = fold_f (acc·term_f DIV 10⁶), num = λ·pm DIV 10⁶,
  *      alt = (10⁶−λ)·pu DIV 10⁶, w_γ = num·10⁶ DIV max(num+alt, 1)
  *   M: λ' = Σn·w DIV N, m_f' = Σ_{γ_f=1}n·w·10⁶ DIV Σn·w,
  *      u_f' from the (10⁶−w) complements
  * — a fixed round count yields the identical integer vector on any
  * engine, and the oracle replays the unrolled rounds digit-for-digit.
  *
  * Scale shape: the corpus-scale work is ONE map-side-combinable
  * pattern-count aggregation — billions of candidate pairs collapse to
  * ≤ 2^F grid rows (the PCA/BT bounded-grid pattern); EM runs as
  * driver long-arithmetic on that grid, zero Spark jobs per round.
  * Capacity: Σn·w·10⁶ must fit a long ⇒ ≲ 9.2e6 pairs at this scale
  * (drop one e3 from the multiplier for more — same shapes). */
object RecordLinkage {

  private val E = 1000000L

  /** Max agreement fields (2^F pattern grid). */
  val MaxFields = 10

  private def clamp(v: Long): Long = math.max(1L, math.min(E - 1L, v))

  /** EM over agreement patterns. `agreementCols` are 0/1 integral
    * columns on `pairs`. Returns one row per OBSERVED pattern:
    * (agreement fields…, n, w_e6) with the posterior match weight
    * after `rounds` EM updates from (λ, m, u) = (0.1, 0.9, 0.1). */
  def emPatterns(pairs: DataFrame, agreementCols: Seq[String],
      rounds: Int = 8): DataFrame = {
    require(agreementCols.nonEmpty && agreementCols.size <= MaxFields,
      s"1..$MaxFields agreement fields, got ${agreementCols.size}")
    require(rounds >= 1 && rounds <= 100,
      s"rounds must be in [1, 100], got $rounds")
    Reserved.guard(agreementCols, Seq("n", "w_e6", "__g"), "RecordLinkage")
    val spark = pairs.sparkSession
    import spark.implicits._
    val f = agreementCols.size
    val grid = BoundedGrid.collectBounded(
      pairs.groupBy(agreementCols.map(c => col(c).cast("int")): _*)
        .agg(count(lit(1)).as("n")),
      1 << f, "agreement-pattern grid",
      "agreement fields must be 0/1 (a 2^F grid); binarize the " +
        "comparators first")
      .map(r => ((0 until f).map(r.getInt).toVector, r.getLong(f)))
      .sortBy(_._1.mkString)
    if (grid.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(
          agreementCols.map(c => org.apache.spark.sql.types
            .StructField(c, org.apache.spark.sql.types.IntegerType)) ++
            Seq(org.apache.spark.sql.types
              .StructField("n", org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types
                .StructField("w_e6", org.apache.spark.sql.types.LongType))))
    val n = grid.map(_._2)
    val bigN = n.sum
    require(bigN <= 9000000L,
      s"$bigN candidate pairs — beyond the 10⁶-scale long capacity " +
        "(~9.2e6); tighten the blocking or drop the scale")
    var lam = 100000L
    var m = Vector.fill(f)(900000L)
    var u = Vector.fill(f)(100000L)
    def weights(): IndexedSeq[Long] = grid.toIndexedSeq.map { case (g, _) =>
      var pm = E; var pu = E
      var i = 0
      while (i < f) {
        pm = pm * (if (g(i) == 1) m(i) else E - m(i)) / E
        pu = pu * (if (g(i) == 1) u(i) else E - u(i)) / E
        i += 1
      }
      val num = lam * pm / E
      val alt = (E - lam) * pu / E
      num * E / math.max(num + alt, 1L)
    }
    for (_ <- 1 to rounds) {
      val w = weights()
      val sw = grid.indices.map(i => n(i) * w(i)).sum
      val sl = grid.indices.map(i => n(i) * (E - w(i))).sum
      lam = clamp(sw / bigN)
      m = (0 until f).map { fi =>
        clamp(grid.indices.filter(i => grid(i)._1(fi) == 1)
          .map(i => n(i) * w(i)).sum * E / math.max(sw, 1L))
      }.toVector
      u = (0 until f).map { fi =>
        clamp(grid.indices.filter(i => grid(i)._1(fi) == 1)
          .map(i => n(i) * (E - w(i))).sum * E / math.max(sl, 1L))
      }.toVector
    }
    val finalW = weights()
    grid.toSeq.zipWithIndex.map { case ((g, cnt), i) =>
      (g, cnt, finalW(i))
    }.map { case (g, cnt, w) => (g.mkString(","), cnt, w) }
      .toDF("__g", "n", "w_e6")
      .select(
        (0 until f).map(i =>
          split(col("__g"), ",").getItem(i).cast("int")
            .as(agreementCols(i))) ++
          Seq(col("n"), col("w_e6")): _*)
  }

  /** Unrolled-EM replay for DuckDB — expects an upstream CTE
    * `pr(g1..g<fields>)`, one row per candidate pair; emits the final
    * per-pattern SELECT. Generated from the SAME (fields, rounds) as
    * [[emPatterns]]. All division is `//` on nonnegative values =
    * the engine's floor. */
  private[graft] def oracleCtes(fields: Int, rounds: Int): String = {
    val gs = (1 to fields).map(i => s"g$i")
    val gList = gs.mkString(", ")
    def foldProd(param: String): String =
      gs.zipWithIndex.foldLeft("CAST(1000000 AS BIGINT)") {
        case (acc, (g, i)) =>
          s"(($acc * (CASE WHEN pat.$g = 1 THEN p.$param${i + 1} " +
            s"ELSE 1000000 - p.$param${i + 1} END)) // 1000000)"
      }
    def eStep(prev: String): String =
      s"""SELECT pat.*,
            ((p.lam * ${foldProd("m")}) // 1000000) AS num,
            (((1000000 - p.lam) * ${foldProd("u")}) // 1000000) AS alt
          FROM pat, $prev p"""
    val rounds_ = (1 to rounds).map { r =>
      val mUpdates = gs.zipWithIndex.map { case (g, i) =>
        s"""GREATEST(1, LEAST(999999,
             (SUM(CASE WHEN $g = 1 THEN n * w ELSE 0 END) * 1000000)
               // GREATEST(SUM(n * w), 1))) AS m${i + 1}"""
      }.mkString(",\n")
      val uUpdates = gs.zipWithIndex.map { case (g, i) =>
        s"""GREATEST(1, LEAST(999999,
             (SUM(CASE WHEN $g = 1 THEN n * (1000000 - w) ELSE 0 END)
                * 1000000)
               // GREATEST(SUM(n * (1000000 - w)), 1))) AS u${i + 1}"""
      }.mkString(",\n")
      s"""e$r AS MATERIALIZED (
            SELECT $gList, n,
                   (num * 1000000) // GREATEST(num + alt, 1) AS w
            FROM (${eStep(s"p${r - 1}")})),
          p$r AS MATERIALIZED (
            SELECT GREATEST(1, LEAST(999999,
                     SUM(n * w) // SUM(n))) AS lam,
                   $mUpdates,
                   $uUpdates
            FROM e$r)"""
    }.mkString(",\n")
    val p0 = "SELECT CAST(100000 AS BIGINT) AS lam, " +
      gs.indices.map(i =>
        s"CAST(900000 AS BIGINT) AS m${i + 1}").mkString(", ") + ", " +
      gs.indices.map(i =>
        s"CAST(100000 AS BIGINT) AS u${i + 1}").mkString(", ")
    s"""pat AS MATERIALIZED (
          SELECT $gList, CAST(COUNT(*) AS BIGINT) AS n
          FROM pr GROUP BY $gList),
        p0 AS ($p0),
        $rounds_
       SELECT $gList, n,
              CAST((num * 1000000) // GREATEST(num + alt, 1) AS BIGINT)
                AS w_e6
       FROM (${eStep(s"p$rounds")})
       ORDER BY $gList"""
  }
}
