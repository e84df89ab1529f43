package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-identification-risk operators over quasi-identifiers — the privacy
  * gate a dataset passes before leaving the pipeline (Sweeney's
  * k-anonymity; Machanavajjhala et al.'s l-diversity): a row is safe to
  * release only when at least k−1 other rows share its quasi-identifier
  * combination (k-anonymity), and a group of look-alikes is only safe
  * when the sensitive attribute takes ≥ l distinct values inside it
  * (l-diversity — a 12-strong group that all share one salary still
  * discloses the salary). Complements the content-level PII scrubbing
  * (L23): that redacts what a row SAYS, this bounds what a row's
  * presence REVEALS.
  *
  * Scale shape: one map-side-combinable groupBy over the quasi columns
  * builds the group table (|groups| ≪ |rows| by nature — that is what
  * makes them quasi-identifiers), which AQE broadcasts back into the
  * row-level join; the corpus is scanned once and never shuffled wider
  * than the quasi columns. The join is NULL-SAFE (`<=>`): a null quasi
  * value is a value — grouping already treats it as one group, and a
  * null-rejecting join would silently release every null-keyed row
  * unchecked. Suppression (dropping unsafe rows) is the one exact
  * mechanism; generalization ladders are a caller-side projection
  * (coarsen, then re-check) composed from the same primitives. */
object Privacy {

  /** Columns the gates add internally. An input already carrying one
    * would collide at the join-back — and `drop("n")` afterwards drops
    * ALL occurrences by name, silently removing the user's column too —
    * so reject up front (the IncrementalAgg.PartialCols discipline). */
  private val ReservedCols = Seq("n", "n_sensitive")

  private def grouped(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: Option[String]): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    ReservedCols.foreach(c => require(!df.columns.contains(c),
      s"input column '$c' collides with a privacy-gate aggregate column"))
    df.columns.find(_.startsWith("__g_")).foreach(c => require(false,
      s"input column '$c' collides with the join-back rename prefix"))
    val aggs = count(lit(1)).as("n") +: sensitiveCol.toSeq.map(s =>
      countDistinct(col(s)).as("n_sensitive"))
    df.groupBy(quasiCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  private def joinBack(df: DataFrame, groups: DataFrame,
      quasiCols: Seq[String]): DataFrame = {
    val g = quasiCols.foldLeft(groups) { (d, c) =>
      d.withColumnRenamed(c, s"__g_$c")
    }
    val cond: Column = quasiCols.map(c => col(c) <=> col(s"__g_$c"))
      .reduce(_ && _)
    df.join(g, cond).drop(quasiCols.map(c => s"__g_$c"): _*)
  }

  /** Rows whose quasi-identifier group has at least `k` members — the
    * k-anonymous release set (suppression mechanism: unsafe groups are
    * dropped whole). */
  def kAnonymous(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    joinBack(df, grouped(df, quasiCols, None).filter(col("n") >= k),
      quasiCols).drop("n")
  }

  /** Rows whose quasi-identifier group carries at least `l` DISTINCT
    * values of `sensitiveCol` — the l-diverse release set. (Null
    * sensitive values follow count-distinct semantics: not counted.) */
  def lDiverse(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
      l: Int): DataFrame = {
    require(l >= 1, s"l $l must be >= 1")
    joinBack(df,
      grouped(df, quasiCols, Some(sensitiveCol))
        .filter(col("n_sensitive") >= l),
      quasiCols).drop("n", "n_sensitive")
  }

  /** The audit table behind both gates: one row per quasi-group with its
    * size, distinct-sensitive count, and the two verdicts (int 0/1 —
    * the battery's portable boolean convention). This is what a privacy
    * review actually reads: which groups fail, and by how much. */
  def groupReport(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Int, l: Int): DataFrame = {
    require(k >= 1 && l >= 1, s"k=$k, l=$l must be >= 1")
    grouped(df, quasiCols, Some(sensitiveCol))
      .withColumn("k_ok", (col("n") >= k).cast("int"))
      .withColumn("l_ok", (col("n_sensitive") >= l).cast("int"))
  }

  /** ε-differentially-private noisy count release (VERDICT r10 #5) —
    * the NOISE mechanism completing the family next to the k-anon /
    * l-diversity suppression gates: per quasi-group, the true count
    * plus discrete (two-sided geometric) Laplace noise
    * (Ghosh, Roughgarden & Sundararajan 2009, "Universally Utility-
    * Maximizing Privacy Mechanisms"; the geometric mechanism):
    *
    *   Z = G1 − G2,  Gi = floor(ln(Ui) / ln α),  α = e^(−ε/Δ)
    *
    * Each Gi is a geometric draw by inverse CDF, so
    * P(Z = z) = (1−α)/(1+α) · α^|z| — the discrete Laplace — and a
    * COUNT query (sensitivity Δ = 1 per added/removed row) satisfies
    * ε-DP: neighboring counts shift the pmf by one, bounding every
    * likelihood ratio by α^(−Δ) = e^ε (spec-pinned numerically).
    *
    * Determinism contract (the L47 uniform): each cell derives its two
    * uniforms from md5("dpl:<i>:<seed>:<group key>") as 52-bit dyadic
    * rationals in (0, 1) — replayable across engines, partitionings
    * and runs, so the oracle reproduces the release bit-for-bit.
    * ln α is written −(ε/Δ) EXACTLY (never exp-then-ln — one less
    * cross-engine libm surface). A SEEDED release is the pipeline-
    * testing form: real deployments draw the seed once, secretly, and
    * release each statistic ONCE — replaying with fresh seeds would
    * compose ε-budgets additively (documented, not enforced here).
    * True counts never leave this operator — output is the noisy
    * release only, plus the (ε, Δ) accounting columns an audit reads.
    *
    * Scale shape: one map-side-combinable groupBy (the [[grouped]]
    * shape, |groups| ≪ |rows|), then a narrow codegen'd md5/ln
    * projection per GROUP row — no second shuffle, no per-corpus-row
    * noise work. */
  def dpCounts(df: DataFrame, quasiCols: Seq[String], eps: Double,
      seed: String, sensitivity: Int = 1): DataFrame = {
    require(eps > 0.0 && eps <= 20.0, s"eps $eps outside (0, 20]")
    require(sensitivity >= 1, s"sensitivity $sensitivity must be >= 1")
    val lnAlpha = -(eps / sensitivity) // = ln e^(−ε/Δ), exact by identity
    // '|'-joined null-sentinel key: a quasi VALUE containing '|' could
    // alias two groups' noise streams (correlated noise, never a wrong
    // oracle compare — both engines share the key) — acceptable for
    // grouping columns, which are categorical by nature
    val groupKey = concat_ws("|",
      quasiCols.map(c => coalesce(col(c).cast("string"), lit(" "))): _*)
    val twoPow52 = lit(4503599627370496.0)
    def u(tag: Int): Column =
      (conv(substring(md5(concat(lit(s"dpl:$tag:$seed:"), groupKey)
          .cast("binary")), 1, 13), 16, 10).cast("double") + lit(0.5)) /
        twoPow52
    def geom(tag: Int): Column =
      floor(log(u(tag)) / lit(lnAlpha)).cast("long")
    grouped(df, quasiCols, None)
      .select(quasiCols.map(col) ++ Seq(
        (col("n") + geom(1) - geom(2)).as("noisy_n"),
        lit(eps).as("eps"),
        lit(sensitivity).cast("int").as("sensitivity")): _*)
  }

  /** Sparse vector technique — AboveThreshold, the c-release form
    * (Dwork & Roth 2014 §3.6 Alg. 2; Lyu, Su & Li 2017 SVT): stream
    * the group-count queries in deterministic key order, answer only
    * "is this count above T" with noise on BOTH the threshold and each
    * query, and HALT after the c-th above — the mechanism that lets an
    * analyst probe many queries while paying ε only for the hits. The
    * classic accounting: ε/2 on the one threshold draw (scale 2Δ/ε₁),
    * ε/2 across the c possible releases (per-query scale 4cΔ/ε₂).
    *
    * Same determinism contract as [[dpCounts]] (seeded md5 dyadic
    * uniforms, discrete Laplace as a geometric difference, ln α written
    * exactly) — a seeded release is the pipeline-testing form. True
    * counts never leave: the output is (quasi cols, `answer` 0/1) for
    * the ANSWERED prefix only (evaluation stops with the c-th above,
    * exactly the textbook halting rule).
    *
    * Scale shape: one map-side-combinable groupBy, a narrow md5
    * projection per GROUP row, one group-grid window for the halting
    * prefix — no corpus-row noise work, no second corpus shuffle. */
  def svtAboveThreshold(df: DataFrame, quasiCols: Seq[String],
      threshold: Long, eps: Double, c: Int, seed: String,
      sensitivity: Int = 1): DataFrame = {
    require(eps > 0.0 && eps <= 20.0, s"eps $eps outside (0, 20]")
    require(c >= 1, s"c $c must be >= 1")
    require(sensitivity >= 1, s"sensitivity $sensitivity must be >= 1")
    Reserved.guard(quasiCols, Seq("answer", "eps", "c", "__prior"),
      "svtAboveThreshold")
    val lnAlphaT = -(eps / 2.0) / (2.0 * sensitivity)
    val lnAlphaQ = -(eps / 2.0) / (4.0 * c * sensitivity)
    val groupKey = concat_ws("|",
      quasiCols.map(cc => coalesce(col(cc).cast("string"), lit(" "))): _*)
    val twoPow52 = lit(4503599627370496.0)
    def u(tag: String, key: Column): Column =
      (conv(substring(md5(concat(lit(s"svt:$tag:$seed:"), key)
          .cast("binary")), 1, 13), 16, 10).cast("double") + lit(0.5)) /
        twoPow52
    def geom(tag: String, key: Column, lnAlpha: Double): Column =
      floor(log(u(tag, key)) / lit(lnAlpha)).cast("long")
    // ONE threshold draw (constant key) shared by every query row
    val noisyT = lit(threshold) +
      geom("t1", lit("T"), lnAlphaT) - geom("t2", lit("T"), lnAlphaT)
    val flagged = grouped(df, quasiCols, None)
      .select(quasiCols.map(col) :+
        (col("n") + geom("q1", groupKey, lnAlphaQ)
          - geom("q2", groupKey, lnAlphaQ) >= noisyT)
          .cast("int").as("answer"): _*)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(quasiCols.map(col): _*)
    flagged
      .withColumn("__prior",
        coalesce(sum(col("answer")).over(w), lit(0L)) - col("answer"))
      .filter(col("__prior") < c) // halt AFTER the c-th above answers
      .select(quasiCols.map(col) :+ col("answer") :+
        lit(eps).as("eps") :+ lit(c).cast("int").as("c"): _*)
  }
}
