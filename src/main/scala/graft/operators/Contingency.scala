package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact χ² test of independence over a contingency grid (Pearson
  * 1900; the categorical-ASSOCIATION member of the QC panel —
  * [[Benford.chiSquare]] asks "does one margin match a FIXED law",
  * this asks "are two labelings related at all": lang × quality-band,
  * source × mislabel-flag, rater × rater) with Cramér's V (Cramér
  * 1946 §21.9) as the [0,1] effect size that N alone cannot inflate.
  *
  * Integer-exact derivation: with cell counts n_rc, margins R_r, C_c
  * and total N,
  *   χ² = Σ_rc (N·n_rc − R_r·C_c)² / (N·R_r·C_c)
  * (the (n−E)²/E form multiplied through by N²/N² — no float E ever
  * materializes). Quantization contract (the L157 cascade stance — a
  * DEFINED statistic, floors replayed token-for-token):
  *   chi2_e6 = Σ_rc div(10⁶·(N·n_rc − R_r·C_c)², N·R_r·C_c)
  * one truncating division per OCCUPIED cell (empty cells contribute
  * (0−RC)²-terms ONLY through occupied-margin products — absent (r,c)
  * pairs with both margins present DO contribute and are materialized
  * by the margin cross of the cell grid, see below); then
  *   v2_e6 = div(chi2_e6, N·(min(r,c) − 1))
  * the SQUARED Cramér V at 1e-6 (V itself needs a square root — the
  * L138 κ convention: emit the exact square, not a rounded root).
  * Verdict vs [[RankTest.Chi2Crit95E6ByDf]] at df = (r−1)(c−1); df > 8
  * ⇒ sig NULL with chi2 still emitted; a degenerate grid (r < 2 or
  * c < 2) ⇒ NULL statistics (nothing to associate).
  *
  * Capacity: (N·n − RC)² ≤ N⁴, so 10⁶·N⁴ < 10³⁸ ⇒ N ≤ ~4·10⁷ rows
  * per panel (the L157 bound; subsample beyond — the verdict is long
  * decided).
  *
  * Scale shape: ONE map-side-combinable (panel, r, c) count collapses
  * the corpus to the occupied-cell grid; margins are grid-sized
  * aggregations of THAT grid; the full r×c term grid (including
  * zero cells) is the margin×margin equi-join on panel — |r|·|c|
  * rows, category-sized, never corpus-sized — left-joined back to the
  * occupied cells. */
object Contingency {

  /** Per-panel χ² independence + Cramér's V² between `rowCol` and
    * `colCol` labelings: (panelCol, n, r, c, chi2_e6, v2_e6, sig).
    * Null panel/row/col values drop. */
  def chiSquare(df: DataFrame, panelCol: String, rowCol: String,
      colCol: String): DataFrame = {
    Reserved.guard(Seq(panelCol),
      Seq("__r", "__c", "__n", "__rn", "__cn", "__nn", "__rdim",
        "__cdim", "__term", "n", "r", "c", "chi2_e6", "v2_e6", "sig"),
      "Contingency")
    val d38 = "decimal(38,0)"
    val base = df
      .filter(col(panelCol).isNotNull && col(rowCol).isNotNull &&
        col(colCol).isNotNull)
      .select(col(panelCol), col(rowCol).cast("string").as("__r"),
        col(colCol).cast("string").as("__c"))
    val cells = base.groupBy(col(panelCol), col("__r"), col("__c"))
      .agg(count(lit(1)).as("__n"))
    val rowm = cells.groupBy(col(panelCol), col("__r"))
      .agg(sum(col("__n")).as("__rn"))
    val colm = cells.groupBy(col(panelCol), col("__c"))
      .agg(sum(col("__n")).as("__cn"))
    val tot = cells.groupBy(col(panelCol))
      .agg(sum(col("__n")).as("__nn"))
    // the FULL r×c grid: zero cells still carry (0 − RC/N)² mass
    val grid = rowm.join(colm, Seq(panelCol))
      .join(cells, Seq(panelCol, "__r", "__c"), "left")
      .join(tot, Seq(panelCol))
      .withColumn("__n", coalesce(col("__n"), lit(0L)))
    val dev = col("__nn").cast(d38) * col("__n").cast(d38) -
      col("__rn").cast(d38) * col("__cn").cast(d38)
    val term = call_function("div",
      lit(1000000L).cast(d38) * dev * dev,
      col("__nn").cast(d38) * col("__rn").cast(d38)
        * col("__cn").cast(d38))
    val perPanel = grid.withColumn("__term", term)
      .groupBy(col(panelCol))
      .agg(max(col("__nn")).as("n"),
        countDistinct(col("__r")).as("r"),
        countDistinct(col("__c")).as("c"),
        sum(col("__term")).cast("long").as("__chi2"))
    val dfree = (col("r") - 1L) * (col("c") - 1L)
    perPanel
      .withColumn("chi2_e6",
        when(col("r") < 2L || col("c") < 2L, lit(null).cast("long"))
          .otherwise(col("__chi2")))
      .withColumn("v2_e6",
        when(col("chi2_e6").isNull, lit(null).cast("long"))
          .otherwise(call_function("div", col("chi2_e6").cast(d38),
            col("n").cast(d38)
              * (least(col("r"), col("c")) - 1L).cast(d38))
            .cast("long")))
      .withColumn("sig",
        when(col("chi2_e6").isNull, lit(0L))
          .when(dfree > 8L, lit(null).cast("long"))
          .otherwise((col("chi2_e6") >=
            element_at(typedlit(RankTest.Chi2Crit95E6ByDf),
              dfree.cast("int"))).cast("long")))
      .select(col(panelCol), col("n"), col("r"), col("c"),
        col("chi2_e6"), col("v2_e6"), col("sig"))
  }

  /** Simpson's-paradox reversal detector (Simpson 1951, JRSS B; the
    * Yule 1903 association paradox) — the CONFOUNDING screen a
    * curation pipeline runs before trusting any pooled 2×2 read
    * ("dedup helps quality overall" can be the pooled artifact of a
    * stratum mix): per stratum the exact association direction
    *   Δ_s = n₁₁·n₀₀ − n₁₀·n₀₁
    * (the cross-product / odds-ratio numerator — sign(Δ) is the
    * association sign, no division, no float), the pooled Δ over
    * summed cells, and the STRICT reversal verdict: pooled sign
    * nonzero, every stratum sign nonzero, and the pooled sign
    * opposite to EVERY stratum's. Flags (binary 0/1) outside {0,1}
    * drop (hygiene, spec-pinned).
    *
    * Capacity: Δ is a product of two cell counts — DECIMAL(38,0)
    * holds any N ≤ ~10¹⁸ (cells ≤ N); no quantization anywhere, the
    * statistic is a pure integer sign.
    *
    * Scale shape: ONE map-side-combinable (panel, stratum)
    * conditional-count aggregation collapses the corpus; the pooled
    * pass is a stratum-grid aggregation; the verdict is grid math. */
  def simpsonReversal(df: DataFrame, panelCol: String,
      stratumCol: String, rowCol: String, colCol: String): DataFrame = {
    Reserved.guard(Seq(panelCol),
      Seq("__s", "__r", "__c", "__n11", "__n10", "__n01", "__n00",
        "__sign", "n_strata", "n_pos", "n_neg", "pooled_sign",
        "reversal"),
      "Contingency")
    val d38 = "decimal(38,0)"
    val base = df
      .filter(col(panelCol).isNotNull && col(stratumCol).isNotNull)
      .select(col(panelCol), col(stratumCol).cast("string").as("__s"),
        col(rowCol).cast("long").as("__r"),
        col(colCol).cast("long").as("__c"))
      .filter(col("__r").isin(0L, 1L) && col("__c").isin(0L, 1L))
    def cell(r: Long, c: Long) =
      sum(when(col("__r") === r && col("__c") === c, 1L).otherwise(0L))
    val strata = base.groupBy(col(panelCol), col("__s"))
      .agg(cell(1L, 1L).as("__n11"), cell(1L, 0L).as("__n10"),
        cell(0L, 1L).as("__n01"), cell(0L, 0L).as("__n00"))
    def delta(p: String) =
      col(p + "n11").cast(d38) * col(p + "n00").cast(d38) -
        col(p + "n10").cast(d38) * col(p + "n01").cast(d38)
    val signed = strata.withColumn("__sign",
      signum(delta("__")).cast("long"))
    signed.groupBy(col(panelCol))
      .agg(count(lit(1)).as("n_strata"),
        sum((col("__sign") === 1L).cast("long")).as("n_pos"),
        sum((col("__sign") === -1L).cast("long")).as("n_neg"),
        sum(col("__n11")).as("__n11"), sum(col("__n10")).as("__n10"),
        sum(col("__n01")).as("__n01"), sum(col("__n00")).as("__n00"))
      .withColumn("pooled_sign", signum(delta("__")).cast("long"))
      .withColumn("reversal",
        ((col("pooled_sign") === 1L && col("n_neg") === col("n_strata"))
          || (col("pooled_sign") === -1L
            && col("n_pos") === col("n_strata"))).cast("long"))
      .select(col(panelCol), col("n_strata"), col("n_pos"),
        col("n_neg"), col("pooled_sign"), col("reversal"))
  }

  /** Mantel–Haenszel stratum-adjusted 2×2 association + the CMH test
    * (r16, L192; Mantel & Haenszel 1959, JNCI 22; Cochran 1954 — the
    * ANSWER to the question [[simpsonReversal]] only detects: when a
    * stratum mix confounds the pooled 2×2, the MH common odds ratio
    * and the CMH χ² read the association WITHIN strata, pooled with
    * the right weights — the adjusted estimate that undoes the
    * paradox instead of merely flagging it).
    *
    * With per-stratum cells a=n11, b=n10, c=n01, d=n00, n = a+b+c+d:
    *   OR_MH = Σ(a·d/n) / Σ(b·c/n)
    *   CMH   = (|Σa − ΣE| − ½)² / ΣV,  E = (a+b)(a+c)/n,
    *           V = (a+b)(c+d)(a+c)(b+d) / (n²(n−1))
    * Quantization (a documented per-stratum cascade, replayed
    * token-for-token): each stratum's ad/n, bc/n, E, V floor ONCE at
    * 10⁶; or_e6 = ⌊10⁶·Σad_e6/Σbc_e6⌋ (Σbc_e6 = 0 ⇒ NULL — the
    * infinite-OR edge surfaced, not faked); OE = 10⁶·Σa − ΣE_e6,
    * CC = max(0, |OE| − 500000) (the ½ continuity correction at the
    * 10⁶ scale), cmh_e6 = ⌊CC²/ΣV_e6⌋ (ΣV = 0 ⇒ NULL). Strata with
    * n < 2 contribute no V (the lone-subject convention); non-binary
    * rows drop (the [[simpsonReversal]] hygiene). d_sign = sign(OE);
    * sig vs χ²₁ = 3.841459 (CMH ~ χ²₁ under H₀ for ANY number of
    * strata — the test's point). Capacity: V's n⁴·10⁶ ⇒ n ≤ ~10⁷
    * rows/stratum; CC² ≤ 10¹²N² ⇒ N ≤ ~10¹³/panel.
    *
    * Scale shape: ONE map-side (panel, stratum) conditional-count agg
    * collapses the corpus; the cascade and the panel rollup are
    * stratum-grid math — nothing corpus-sized after. */
  def mantelHaenszel(df: DataFrame, panelCol: String,
      stratumCol: String, rowCol: String, colCol: String): DataFrame = {
    Reserved.guard(Seq(panelCol),
      Seq("__s", "__r", "__c", "__n11", "__n10", "__n01", "__n00",
        "__n", "__ad", "__bc", "__e", "__v", "__a", "n_strata", "n",
        "or_e6", "cmh_e6", "d_sign", "sig"),
      "Contingency")
    val d38 = "decimal(38,0)"
    val base = df
      .filter(col(panelCol).isNotNull && col(stratumCol).isNotNull)
      .select(col(panelCol), col(stratumCol).cast("string").as("__s"),
        col(rowCol).cast("long").as("__r"),
        col(colCol).cast("long").as("__c"))
      .filter(col("__r").isin(0L, 1L) && col("__c").isin(0L, 1L))
    def cell(r: Long, c: Long) =
      sum(when(col("__r") === r && col("__c") === c, 1L).otherwise(0L))
    val strata = base.groupBy(col(panelCol), col("__s"))
      .agg(cell(1L, 1L).as("__n11"), cell(1L, 0L).as("__n10"),
        cell(0L, 1L).as("__n01"), cell(0L, 0L).as("__n00"))
      .withColumn("__n", col("__n11") + col("__n10") + col("__n01")
        + col("__n00"))
    def dc(c: org.apache.spark.sql.Column) = c.cast(d38)
    val m = lit(1000000L).cast(d38)
    val terms = strata
      .withColumn("__ad", call_function("div",
        m * dc(col("__n11")) * dc(col("__n00")), dc(col("__n"))))
      .withColumn("__bc", call_function("div",
        m * dc(col("__n10")) * dc(col("__n01")), dc(col("__n"))))
      .withColumn("__e", call_function("div",
        m * dc(col("__n11") + col("__n10"))
          * dc(col("__n11") + col("__n01")), dc(col("__n"))))
      .withColumn("__v", when(col("__n") < 2L, lit(0L).cast(d38))
        .otherwise(call_function("div",
          m * dc(col("__n11") + col("__n10"))
            * dc(col("__n01") + col("__n00"))
            * dc(col("__n11") + col("__n01"))
            * dc(col("__n10") + col("__n00")),
          dc(col("__n")) * dc(col("__n"))
            * dc(col("__n") - 1L))))
    val panel = terms.groupBy(col(panelCol))
      .agg(count(lit(1)).as("n_strata"), sum(col("__n")).as("n"),
        sum(col("__n11")).as("__a"), sum(col("__ad")).as("__ad"),
        sum(col("__bc")).as("__bc"), sum(col("__e")).as("__e"),
        sum(col("__v")).as("__v"))
    val oe = m * dc(col("__a")) - col("__e")
    val cc = greatest(abs(oe) - lit(500000L).cast(d38),
      lit(0L).cast(d38))
    panel.select(col(panelCol), col("n_strata"), col("n"),
      when(col("__bc") === lit(0L).cast(d38), lit(null).cast("long"))
        .otherwise(call_function("div", m * col("__ad"), col("__bc"))
          .cast("long")).as("or_e6"),
      when(col("__v") === lit(0L).cast(d38), lit(null).cast("long"))
        .otherwise(call_function("div", cc * cc, col("__v"))
          .cast("long")).as("cmh_e6"),
      signum(oe).cast("long").as("d_sign"))
      .withColumn("sig",
        when(col("cmh_e6").isNull, lit(0L))
          .otherwise((col("cmh_e6") >= lit(3841459L)).cast("long")))
  }

  /** JVM mirror of the [[mantelHaenszel]] cascade over one panel's
    * stratum cells (a, b, c, d) — the Manifest.rowHashJvm convention:
    * the streaming twin's snapshot scorer MUST read the same numbers
    * as the batch columns from the same counts, pinned in spec.
    * Returns (or_e6, cmh_e6, d_sign, sig). */
  private[graft] def mantelHaenszelJvm(
      cells: Seq[(Long, Long, Long, Long)])
      : (Option[Long], Option[Long], Long, Long) = {
    var sad, sbc, se, sv, sa = BigInt(0)
    for ((a, b, c, d) <- cells) {
      val n = a + b + c + d
      if (n > 0) {
        sad += BigInt(1000000) * a * d / n
        sbc += BigInt(1000000) * b * c / n
        se += BigInt(1000000) * (a + b) * (a + c) / n
        if (n >= 2)
          sv += BigInt(1000000) * (a + b) * (c + d) * (a + c) * (b + d) /
            (BigInt(n) * n * (n - 1))
        sa += a
      }
    }
    val oe = BigInt(1000000) * sa - se
    val cc = (oe.abs - 500000).max(BigInt(0))
    val or = if (sbc == 0) None
      else Some((BigInt(1000000) * sad / sbc).toLong)
    val cmh = if (sv == 0) None else Some((cc * cc / sv).toLong)
    val sig = cmh match {
      case Some(x) if x >= 3841459L => 1L
      case _ => 0L
    }
    (or, cmh, oe.signum.toLong, sig)
  }

  /** Cochran–Armitage trend test (r15, L182; Cochran 1954,
    * Biometrics 10; Armitage 1955, Biometrics 11 — the ORDERED
    * companion of [[chiSquare]]: a 2×k grid where the k categories
    * carry scores, asking not "is there association" but "does the
    * rate RISE with the score" — quality-band vs flag-rate, length
    * band vs language share, the dose-response shape every curation
    * threshold sweep implies). Pays one degree of freedom for the
    * ordering and buys power against monotone alternatives the
    * unordered χ² dilutes across k−1 df.
    *
    * With category totals n_j, positives r_j, scores w_j (caller-
    * provided integers — the ordering IS the input), N = Σn, R = Σr:
    *   Z² = N·(N·Σw_j r_j − R·Σw_j n_j)²
    *        / (R·(N−R)·(N·Σw_j²n_j − (Σw_j n_j)²))
    * an exact LONG rational (Z² ~ χ²₁ under H₀);
    * z2_e6 = ONE truncating division; d_sign = the trend direction
    * sign(N·Σwr − R·Σwn). R = 0, R = N, or a zero score-variance
    * denominator ⇒ NULL (no trend is definable). Values outside
    * {0,1} drop (the simpsonReversal hygiene). Verdict vs χ²₁.
    *
    * Capacity: 10⁶·N·(N²·w_max)² < 10³⁸ ⇒ N ≤ ~10⁶/panel at
    * w_max ≤ 8 (documented — subsample beyond; the verdict is long
    * decided, the CvM stance).
    *
    * Scale shape: ONE map-side (panel, score) conditional-count
    * aggregation collapses the corpus; everything after is
    * panel-grid arithmetic, join-light. */
  def armitageTrend(df: DataFrame, panelCol: String, scoreCol: String,
      valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    Reserved.guard(Seq(panelCol),
      Seq("__w", "__v", "__n", "__r", "__sn", "__sr", "__s2n", "k",
        "n", "pos", "z2_e6", "d_sign", "sig"),
      "Contingency")
    val base = df
      .filter(col(panelCol).isNotNull && col(scoreCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(panelCol), col(scoreCol).cast("long").as("__w"),
        col(valueCol).cast("long").as("__v"))
      .filter(col("__v").isin(0L, 1L))
    val cats = base.groupBy(col(panelCol), col("__w"))
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__r"))
    val agg = cats.groupBy(col(panelCol))
      .agg(countDistinct(col("__w")).as("k"),
        sum(col("__n")).as("n"), sum(col("__r")).as("pos"),
        sum(col("__w") * col("__n")).as("__sn"),
        sum(col("__w") * col("__r")).as("__sr"),
        sum(col("__w") * col("__w") * col("__n")).as("__s2n"))
    val nn = col("n").cast(d38); val rr = col("pos").cast(d38)
    val num = nn * col("__sr").cast(d38) - rr * col("__sn").cast(d38)
    val den = nn * col("__s2n").cast(d38) -
      col("__sn").cast(d38) * col("__sn").cast(d38)
    agg
      .withColumn("d_sign", signum(num).cast("long"))
      .withColumn("z2_e6",
        when(col("pos") === 0L || col("pos") === col("n")
            || den === lit(0L).cast(d38), lit(null).cast("long"))
          .otherwise(call_function("div",
            lit(1000000L).cast(d38) * nn * num * num,
            rr * (nn - rr) * den).cast("long")))
      .withColumn("sig",
        when(col("z2_e6").isNull, lit(0L))
          .otherwise((col("z2_e6") >=
            element_at(typedlit(RankTest.Chi2Crit95E6ByDf), 1))
            .cast("long")))
      .select(col(panelCol), col("k"), col("n"), col("pos"),
        col("z2_e6"), col("d_sign"), col("sig"))
  }

  /** Table-exact mutual information + normalized MI over the same
    * contingency grid as [[chiSquare]] (r15, L169; Shannon 1948; NMI
    * normalization is Kvålseth 1987's MI/min(H_r, H_c) — the min form
    * on purpose: the common √(H_r·H_c) needs a square root the
    * integer contract forbids, and min is the tighter of the two
    * bounds). The INFORMATION lens on the association the χ² lens
    * already measures: MI is the feature-selection / redundancy
    * screen ("how many nats does knowing lang give about source"),
    * comparable across grids in a way raw χ² is not.
    *
    * Integer construction through the L151 fixed-point table ln
    * ([[Drift.withTableLn]] — FIFTH consumer):
    *   MI = (1/N)·Σ_rc n·ln(N·n/(R·C))     (occupied cells only —
    *     0·ln(0) ≡ 0 by continuity, so unlike χ² the ZERO cells
    *     carry no mass and no margin-cross grid is materialized)
    *   mi_e9  = div(Σ n·lnE9(N·n, R·C), N)  — terms summed exactly
    *     in DECIMAL(38,0), ONE truncating division
    *   H_r    = (1/N)·Σ_r R·ln(N/R), H_c likewise (table ln again)
    *   nmi_e6 = div(10⁶·Σ n·lnE9(Nn, RC), min(Σ R·lnE9(N,R),
    *                                          Σ C·lnE9(N,C)))
    *     (the 1/N in MI and in H cancels — the ratio is computed on
    *     the UNDIVIDED e9 sums, one quantization total).
    * Approximation stance (the L159 JSD class, stated not clamped):
    * every table ln floors by ε ∈ [0, ln(257/256)), and since the MI
    * weights n/N sum to 1 the TOTAL under-read is bounded by
    * ln(257/256) ≈ 3.9·10⁻³ nats regardless of grid size — mi_e9 can
    * read up to ~3.9·10⁶ e9-units NEGATIVE on independent data (the
    * A/A leg exercises this live; true MI is never negative).
    *
    * NO G-test verdict, by design (measured, r15): the
    * likelihood-ratio G = 2N·MI amplifies the bounded MI floor error
    * by 2N — at N = 5000 the under-read bound is already ~39 nats
    * against a df-1 threshold of 3.84, so a table-G verdict would be
    * noise wearing a significance label (measured live: the zh_len
    * leg at sf0.01 reads −0.6·10⁹ where the true G is ≈ +0.7·10⁹).
    * This is the JSD-vs-PSI error-scaling lesson one level up:
    * verdicts on this grid stay with [[chiSquare]], whose Pearson
    * statistic is EXACT integer arithmetic with no ln anywhere.
    *
    * Capacity: N·n ≤ N² must fit a LONG for the bin() probe ⇒
    * N ≤ 3·10⁹ rows/panel; Σ n·ln_e9 is summed in DECIMAL(38,0)
    * (never a LONG), so that is the only bound (shard beyond).
    *
    * Scale shape: ONE map-side (panel, r, c) count collapses the
    * corpus; margins and totals are grid aggs of that grid; three
    * ln chains run over grid-sized frames (cells, row margins, col
    * margins); everything joins back on panel — category-sized,
    * never corpus-sized. */
  def mutualInformation(df: DataFrame, panelCol: String, rowCol: String,
      colCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    Reserved.guard(Seq(panelCol),
      Seq("__r", "__c", "__n", "__rn", "__cn", "__nn", "__misum",
        "__hrsum", "__hcsum", "__minum", "__miden", "__mik0", "__mik",
        "__mimi", "__miln", "__hrnum", "__hrden", "__hrk0", "__hrk",
        "__hrmi", "__hrln", "__hcnum", "__hcden", "__hck0", "__hck",
        "__hcmi", "__hcln", "n", "r", "c", "mi_e9", "nmi_e6", "g_e9",
        "sig"),
      "Contingency")
    val base = df
      .filter(col(panelCol).isNotNull && col(rowCol).isNotNull &&
        col(colCol).isNotNull)
      .select(col(panelCol), col(rowCol).cast("string").as("__r"),
        col(colCol).cast("string").as("__c"))
    val cells = base.groupBy(col(panelCol), col("__r"), col("__c"))
      .agg(count(lit(1)).as("__n"))
    val rowm = cells.groupBy(col(panelCol), col("__r"))
      .agg(sum(col("__n")).as("__rn"))
    val colm = cells.groupBy(col(panelCol), col("__c"))
      .agg(sum(col("__n")).as("__cn"))
    val tot = cells.groupBy(col(panelCol))
      .agg(sum(col("__n")).as("__nn"),
        countDistinct(col("__r")).as("r"),
        countDistinct(col("__c")).as("c"))
    val miCells = Drift.withTableLn(
      cells.join(rowm, Seq(panelCol, "__r"))
        .join(colm, Seq(panelCol, "__c"))
        .join(tot.select(col(panelCol), col("__nn")), Seq(panelCol))
        .withColumn("__minum", col("__nn") * col("__n"))
        .withColumn("__miden", col("__rn") * col("__cn")),
      "__mi")
    val miSum = miCells.groupBy(col(panelCol))
      .agg(sum(col("__n").cast(d38) * col("__miln").cast(d38))
        .as("__misum"))
    val hrSum = Drift.withTableLn(
        rowm.join(tot.select(col(panelCol), col("__nn")), Seq(panelCol))
          .withColumn("__hrnum", col("__nn"))
          .withColumn("__hrden", col("__rn")),
        "__hr")
      .groupBy(col(panelCol))
      .agg(sum(col("__rn").cast(d38) * col("__hrln").cast(d38))
        .as("__hrsum"))
    val hcSum = Drift.withTableLn(
        colm.join(tot.select(col(panelCol), col("__nn")), Seq(panelCol))
          .withColumn("__hcnum", col("__nn"))
          .withColumn("__hcden", col("__cn")),
        "__hc")
      .groupBy(col(panelCol))
      .agg(sum(col("__cn").cast(d38) * col("__hcln").cast(d38))
        .as("__hcsum"))
    val degenerate = col("r") < 2L || col("c") < 2L
    tot.join(miSum, Seq(panelCol)).join(hrSum, Seq(panelCol))
      .join(hcSum, Seq(panelCol))
      .withColumn("mi_e9",
        when(degenerate, lit(null).cast("long"))
          .otherwise(call_function("div", col("__misum"),
            col("__nn").cast(d38)).cast("long")))
      .withColumn("nmi_e6",
        when(degenerate
            || least(col("__hrsum"), col("__hcsum")) <= 0L,
          lit(null).cast("long"))
          .otherwise(call_function("div",
            lit(1000000L).cast(d38) * col("__misum"),
            least(col("__hrsum"), col("__hcsum"))).cast("long")))
      .select(col(panelCol), col("__nn").as("n"), col("r"), col("c"),
        col("mi_e9"), col("nmi_e6"))
  }
}
