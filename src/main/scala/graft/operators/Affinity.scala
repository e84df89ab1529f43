package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Item co-occurrence lift over baskets (Brin et al. 1997 SIGMOD,
  * "interest"; the association-mining view of a flag table) — "do
  * these two labels occur TOGETHER more than chance": for items a, b
  * over N baskets with n_a, n_b item baskets and n_ab joint baskets,
  *   lift = P(a∧b) / (P(a)·P(b)) = n_ab·N / (n_a·n_b)
  * emitted as the exact truncating lift_e6 = div(10⁶·n_ab·N, n_a·n_b)
  * (> 10⁶ ⇒ positive association) beside support_e6 = div(10⁶·n_ab,
  * N). The curation use case is FLAG-REDUNDANCY audit: quality flags
  * that always co-fire are one signal wearing two names — the panel's
  * version of L164's confounding screen, one level down.
  *
  * Presence semantics: a basket either has an item or it doesn't —
  * duplicate (basket, item) rows collapse first (one distinct), so
  * multiplicity never inflates lift. Pairs are unordered (a < b
  * lexicographically, each pair once). Pairs never co-occurring are
  * ABSENT from the output (their lift is 0 and grid-materializing
  * |items|² rows of zero adds nothing the margins don't already say).
  *
  * Capacity: 10⁶·n_ab·N ≤ 10⁶·N² < 10³⁸ ⇒ any N ≤ ~10¹⁶ baskets.
  *
  * Scale shape: the per-basket pair expansion is |basket|² — bounded
  * by the item VOCABULARY here (flags, event types: a handful), the
  * honestly-labeled cost center for open vocabularies (cap the basket
  * or prefilter to the top-K items upstream, the TheilSen-class
  * retrospective shape); everything else is one distinct, two grid
  * aggregations, two grid equi-joins and a 1-row totals broadcast. */
object Affinity {

  /** [[lift]] with the UNIVERSE defaulted to the baskets present in
    * `df` — fine when every basket carries at least one item. When it
    * doesn't (a flag table lists only FLAGGED baskets), this universe
    * conditions on "has ≥ 1 item", which is COLLIDER conditioning:
    * a genuinely independent item then reads lift < 1 against
    * everything (Berkson 1946 — measured at 0.66–0.72 on the gate's
    * hash control, pinned in spec as the motivating contrast). Pass
    * the full universe explicitly for unconditional lift. */
  def lift(df: DataFrame, basketCol: String, itemCol: String): DataFrame =
    lift(df, basketCol, itemCol, df)

  /** Unordered item-pair lift over baskets: (item_a, item_b, n_a,
    * n_b, n_ab, support_e6, lift_e6); N = the distinct `basketCol`
    * values of `universe` (the denominator population — pass the full
    * basket table to avoid the Berkson conditioning documented on the
    * 3-arg overload). Null baskets/items drop. */
  def lift(df: DataFrame, basketCol: String, itemCol: String,
      universe: DataFrame): DataFrame = {
    Reserved.guard(Seq(basketCol, itemCol),
      Seq("__b", "__i", "item_a", "item_b", "n_a", "n_b", "n_ab",
        "support_e6", "lift_e6", "__nu"),
      "Affinity")
    val d38 = "decimal(38,0)"
    val pres = df
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__b"),
        col(itemCol).cast("string").as("__i"))
      .distinct()
    val tot = universe.filter(col(basketCol).isNotNull)
      .agg(countDistinct(col(basketCol)).as("__nu"))
    val counts = pres.groupBy(col("__i")).agg(count(lit(1)).as("n"))
    val a = pres.select(col("__b"), col("__i").as("item_a"))
    val b = pres.select(col("__b"), col("__i").as("item_b"))
    val pairs = a.join(b, Seq("__b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(counts.select(col("__i").as("item_a"), col("n").as("n_a")),
        Seq("item_a"))
      .join(counts.select(col("__i").as("item_b"), col("n").as("n_b")),
        Seq("item_b"))
      .crossJoin(broadcast(tot))
      .select(col("item_a"), col("item_b"), col("n_a"), col("n_b"),
        col("n_ab"),
        call_function("div",
          lit(1000000L).cast(d38) * col("n_ab").cast(d38),
          col("__nu").cast(d38)).cast("long").as("support_e6"),
        call_function("div",
          lit(1000000L).cast(d38) * col("n_ab").cast(d38)
            * col("__nu").cast(d38),
          col("n_a").cast(d38) * col("n_b").cast(d38)).cast("long")
          .as("lift_e6"))
  }
}
