package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Integer p-value tables for the drift dashboard (r16, VERDICT r15
  * #7) — the L151/L157 table discipline extended from critical VALUES
  * to full tail CURVES: a monitored dashboard wants p-values it can
  * feed to [[Fdr.benjaminiHochberg]], and the asymptotic tails
  * (Kolmogorov's KS limit, the standard-normal two-sided tail) are
  * transcendental — `exp`/`erfc` are NOT bit-portable across libms,
  * so computing them live on each engine would hash-flicker. Instead
  * the tails are QUANTIZED ONCE here into integer-at-1e-6 lookup
  * tables on a hundredths grid of the statistic, and both engines
  * consume the SAME literals (the Chi2Crit95E6ByDf convention).
  *
  * Quantization contract (ONE per statistic, documented): the
  * statistic's exact integer square (λ²·10⁴ / z²·10⁴, both exact
  * divisions of exact integer rationals) drops to its centi-unit
  * bucket by floor(IEEE sqrt) — both engines perform the identical
  * sqrt+floor on the identical integer, so the bucket is
  * deterministic cross-engine; the table value is the tail at the
  * bucket's LOWER edge, which over-reads p by at most the 0.01-step
  * curve increment — CONSERVATIVE for discovery (a borderline test
  * needs the next bucket to reject, never the reverse).
  *
  * Sources (public): Kolmogorov 1933 / Smirnov 1948 limit
  * Q(λ) = 2Σ(−1)^{k−1}e^{−2k²λ²} (the theta-dual form below λ = 1,
  * Feller 1948); normal tail via erfc (Abramowitz & Stegun 7.1.2).
  * Tables generated offline from those series at double precision,
  * rounded to 1e-6. */
object PValue {

  /** Two-sided Kolmogorov asymptotic tail Q_KS(λ) at 1e-6, indexed by
    * λ in hundredths (0 ≤ λ_e2 ≤ 349; λ ≥ 3.50 ⇒ 0). Q(1.36) ≈
    * 0.0495 — the classic 5% point sits where it should. */
  private[graft] val KsTail2E6ByLambdaE2: Seq[Long] = Seq(
    1000000L, 1000000L, 1000000L, 1000000L, 1000000L, 1000000L, 1000000L, 1000000L,
    1000000L, 1000000L, 1000000L, 1000000L, 1000000L, 1000000L, 1000000L, 1000000L,
    1000000L, 1000000L, 1000000L, 1000000L, 1000000L, 1000000L, 1000000L, 1000000L,
    1000000L, 1000000L, 1000000L, 1000000L, 999999L, 999996L, 999991L, 999979L,
    999954L, 999909L, 999829L, 999697L, 999489L, 999174L, 998715L, 998071L,
    997192L, 996028L, 994524L, 992623L, 990270L, 987411L, 983995L, 979978L,
    975318L, 969983L, 963945L, 957186L, 949694L, 941466L, 932503L, 922817L,
    912423L, 901344L, 889606L, 877240L, 864283L, 850771L, 836745L, 822248L,
    807323L, 792013L, 776363L, 760418L, 744220L, 727812L, 711235L, 694530L,
    677735L, 660886L, 644019L, 627167L, 610360L, 593628L, 576998L, 560495L,
    544142L, 527961L, 511972L, 496191L, 480635L, 465319L, 450255L, 435455L,
    420929L, 406685L, 392731L, 379072L, 365715L, 352663L, 339919L, 327485L,
    315364L, 303555L, 292059L, 280874L, 270000L, 259434L, 249175L, 239219L,
    229564L, 220206L, 211140L, 202363L, 193870L, 185657L, 177718L, 170049L,
    162644L, 155498L, 148605L, 141960L, 135557L, 129390L, 123454L, 117742L,
    112250L, 106970L, 101898L, 97027L, 92352L, 87866L, 83565L, 79443L,
    75494L, 71712L, 68092L, 64629L, 61318L, 58153L, 55129L, 52242L,
    49486L, 46856L, 44349L, 41959L, 39682L, 37513L, 35449L, 33485L,
    31617L, 29841L, 28154L, 26552L, 25031L, 23587L, 22218L, 20920L,
    19690L, 18525L, 17421L, 16377L, 15390L, 14456L, 13573L, 12739L,
    11952L, 11209L, 10508L, 9846L, 9223L, 8636L, 8083L, 7562L,
    7072L, 6611L, 6177L, 5770L, 5388L, 5028L, 4691L, 4375L,
    4078L, 3800L, 3540L, 3296L, 3068L, 2854L, 2654L, 2467L,
    2293L, 2130L, 1977L, 1835L, 1703L, 1579L, 1464L, 1356L,
    1256L, 1163L, 1076L, 996L, 921L, 851L, 787L, 727L,
    671L, 619L, 571L, 527L, 486L, 447L, 412L, 380L,
    349L, 321L, 295L, 272L, 250L, 229L, 210L, 193L,
    177L, 163L, 149L, 137L, 125L, 114L, 105L, 96L,
    88L, 80L, 73L, 67L, 61L, 56L, 51L, 46L,
    42L, 39L, 35L, 32L, 29L, 26L, 24L, 22L,
    20L, 18L, 16L, 15L, 13L, 12L, 11L, 10L,
    9L, 8L, 7L, 7L, 6L, 6L, 5L, 4L,
    4L, 4L, 3L, 3L, 3L, 2L, 2L, 2L,
    2L, 2L, 1L, 1L, 1L, 1L, 1L, 1L,
    1L, 1L, 1L, 1L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 0L, 0L, 0L, 0L
  )

  /** Two-sided standard-normal tail 2(1−Φ(z)) at 1e-6, indexed by z
    * in hundredths (0 ≤ z_e2 ≤ 499; z ≥ 5.00 ⇒ 0). 2(1−Φ(1.96)) ≈
    * 0.0500. */
  private[graft] val NormTail2E6ByZE2: Seq[Long] = Seq(
    1000000L, 992021L, 984043L, 976067L, 968093L, 960122L, 952156L, 944194L,
    936237L, 928287L, 920344L, 912409L, 904483L, 896566L, 888660L, 880765L,
    872881L, 865010L, 857153L, 849309L, 841481L, 833668L, 825871L, 818092L,
    810330L, 802587L, 794864L, 787160L, 779478L, 771816L, 764177L, 756561L,
    748968L, 741400L, 733857L, 726339L, 718847L, 711382L, 703945L, 696537L,
    689157L, 681806L, 674485L, 667196L, 659937L, 652710L, 645516L, 638355L,
    631227L, 624134L, 617075L, 610051L, 603064L, 596112L, 589197L, 582319L,
    575479L, 568678L, 561915L, 555191L, 548506L, 541862L, 535258L, 528695L,
    522173L, 515692L, 509254L, 502858L, 496504L, 490194L, 483927L, 477704L,
    471525L, 465390L, 459300L, 453255L, 447255L, 441300L, 435391L, 429528L,
    423711L, 417940L, 412216L, 406539L, 400908L, 395325L, 389789L, 384300L,
    378859L, 373466L, 368120L, 362823L, 357573L, 352371L, 347218L, 342112L,
    337055L, 332046L, 327086L, 322174L, 317311L, 312495L, 307728L, 303010L,
    298340L, 293718L, 289145L, 284619L, 280142L, 275713L, 271332L, 266999L,
    262714L, 258476L, 254286L, 250144L, 246049L, 242001L, 238000L, 234046L,
    230139L, 226279L, 222465L, 218697L, 214975L, 211300L, 207669L, 204085L,
    200545L, 197051L, 193601L, 190196L, 186835L, 183518L, 180245L, 177016L,
    173830L, 170687L, 167587L, 164529L, 161513L, 158540L, 155608L, 152717L,
    149867L, 147059L, 144290L, 141562L, 138873L, 136224L, 133614L, 131043L,
    128511L, 126017L, 123560L, 121142L, 118760L, 116415L, 114107L, 111835L,
    109599L, 107398L, 105232L, 103101L, 101005L, 98943L, 96914L, 94919L,
    92957L, 91028L, 89131L, 87266L, 85432L, 83630L, 81859L, 80118L,
    78408L, 76727L, 75076L, 73454L, 71861L, 70296L, 68759L, 67250L,
    65768L, 64314L, 62886L, 61484L, 60108L, 58758L, 57433L, 56133L,
    54858L, 53607L, 52380L, 51176L, 49996L, 48838L, 47704L, 46591L,
    45500L, 44431L, 43383L, 42357L, 41350L, 40364L, 39399L, 38452L,
    37526L, 36618L, 35729L, 34858L, 34006L, 33172L, 32355L, 31555L,
    30773L, 30007L, 29257L, 28524L, 27807L, 27105L, 26419L, 25747L,
    25091L, 24449L, 23821L, 23208L, 22608L, 22021L, 21448L, 20888L,
    20341L, 19806L, 19284L, 18773L, 18275L, 17788L, 17313L, 16848L,
    16395L, 15953L, 15521L, 15099L, 14687L, 14286L, 13894L, 13511L,
    13138L, 12774L, 12419L, 12073L, 11735L, 11406L, 11085L, 10772L,
    10467L, 10170L, 9880L, 9598L, 9322L, 9054L, 8793L, 8538L,
    8291L, 8049L, 7814L, 7585L, 7362L, 7145L, 6934L, 6728L,
    6528L, 6333L, 6144L, 5960L, 5780L, 5606L, 5436L, 5271L,
    5110L, 4954L, 4802L, 4655L, 4511L, 4372L, 4236L, 4105L,
    3977L, 3852L, 3732L, 3614L, 3500L, 3390L, 3282L, 3178L,
    3076L, 2978L, 2882L, 2790L, 2700L, 2612L, 2528L, 2446L,
    2366L, 2288L, 2213L, 2141L, 2070L, 2002L, 1935L, 1871L,
    1809L, 1748L, 1689L, 1633L, 1578L, 1524L, 1473L, 1423L,
    1374L, 1327L, 1282L, 1238L, 1195L, 1154L, 1114L, 1075L,
    1038L, 1002L, 967L, 933L, 900L, 868L, 838L, 808L,
    779L, 752L, 725L, 699L, 674L, 650L, 626L, 604L,
    582L, 561L, 540L, 520L, 501L, 483L, 465L, 448L,
    432L, 416L, 400L, 385L, 371L, 357L, 344L, 331L,
    318L, 306L, 295L, 283L, 273L, 262L, 252L, 243L,
    233L, 224L, 216L, 207L, 199L, 191L, 184L, 177L,
    170L, 163L, 157L, 151L, 145L, 139L, 133L, 128L,
    123L, 118L, 113L, 109L, 104L, 100L, 96L, 92L,
    89L, 85L, 81L, 78L, 75L, 72L, 69L, 66L,
    63L, 61L, 58L, 56L, 53L, 51L, 49L, 47L,
    45L, 43L, 41L, 40L, 38L, 36L, 35L, 33L,
    32L, 30L, 29L, 28L, 27L, 26L, 24L, 23L,
    22L, 21L, 20L, 20L, 19L, 18L, 17L, 16L,
    16L, 15L, 14L, 14L, 13L, 12L, 12L, 11L,
    11L, 10L, 10L, 9L, 9L, 9L, 8L, 8L,
    7L, 7L, 7L, 6L, 6L, 6L, 6L, 5L,
    5L, 5L, 5L, 4L, 4L, 4L, 4L, 4L,
    3L, 3L, 3L, 3L, 3L, 3L, 3L, 2L,
    2L, 2L, 2L, 2L, 2L, 2L, 2L, 2L,
    2L, 2L, 1L, 1L, 1L, 1L, 1L, 1L,
    1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L,
    1L, 1L, 1L, 1L
  )

  private val d38 = "decimal(38,0)"

  /** KS p from the exact sup numerator (ks_num = D·n1·n2, the
    * [[KsDrift]] emission): λ² = ks_num²/(n1·n2·(n1+n2)) exactly at
    * 1e-4, then the bucket lookup. Empty cohorts ⇒ p = 1 (no
    * evidence, the conservative read). */
  def ksTail2E6(ksNum: Column, n1: Column, n2: Column): Column = {
    val l2e4 = call_function("div",
      lit(10000L).cast(d38) * ksNum.cast(d38) * ksNum.cast(d38),
      n1.cast(d38) * n2.cast(d38) * (n1 + n2).cast(d38))
    val le2 = floor(sqrt(l2e4.cast("double"))).cast("int")
    when(n1 === 0L || n2 === 0L, lit(1000000L))
      .when(le2 >= lit(KsTail2E6ByLambdaE2.size), lit(0L))
      .otherwise(element_at(typedlit(KsTail2E6ByLambdaE2), le2 + 1))
  }

  /** Normal two-sided p from an exact z²·10⁶ (the mannWhitney /
    * Mann–Kendall emission): z²·10⁴ by truncating div, bucket lookup.
    * NULL z² (an unrun/degenerate test) stays NULL — [[Fdr]] drops
    * it, the documented unrun-test convention. */
  def normTail2E6(z2E6: Column): Column = {
    val ze2 = floor(sqrt(call_function("div", z2E6.cast(d38),
      lit(100L).cast(d38)).cast("double"))).cast("int")
    when(z2E6.isNull, lit(null).cast("long"))
      .when(ze2 >= lit(NormTail2E6ByZE2.size), lit(0L))
      .otherwise(element_at(typedlit(NormTail2E6ByZE2), ze2 + 1))
  }

  /** The tables as DuckDB list literals — injected into the oracle so
    * both engines consume the SAME constants. */
  private[graft] def ksSqlList: String =
    KsTail2E6ByLambdaE2.mkString("[", ",", "]")
  private[graft] def normSqlList: String =
    NormTail2E6ByZE2.mkString("[", ",", "]")
}
