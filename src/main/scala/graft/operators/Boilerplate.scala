package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level boilerplate detection — the C4/CCNet-style hygiene pass
  * that near-dup removal does not cover: headers, footers, navigation
  * chrome and license blurbs repeat across MANY documents without making
  * any single pair near-identical. The signal is document frequency of
  * n-gram shingles: a shingle appearing in >= `minDf` distinct documents
  * is boilerplate, and a document's boilerplate fraction is the share of
  * its distinct shingles that are boilerplate.
  *
  * Shingles ride as 64-bit hashes from the near-dup battery's fixed
  * xxhash64 family (`NearDup.hashedShingles` — per-doc DISTINCT, so a
  * plain count per shingle IS its document frequency). The oracle
  * recomputes document frequencies over literal n-gram strings; parity
  * rests on the same no-64-bit-collision assumption every hashed query in
  * the battery already makes.
  *
  * Scale shape: shingle once (cached — the corpus is scanned ONCE, the
  * round-2 lesson), then one hash aggregation keyed on the shingle hash
  * for document frequency, one join of the exploded shingles against the
  * FILTERED boilerplate set (far smaller than the full frequency table),
  * and one per-doc aggregation. All shuffles are partial-aggregating
  * bigint-keyed hash exchanges; nothing broadcasts the corpus or
  * collects. Very hot shingles skew the boilerplate join's build side at
  * extreme scale — mitigate with `Skew.saltedJoin` if a profile shows it;
  * the per-shingle df aggregation itself partial-aggregates map-side so
  * the hot keys collapse before the exchange. */
object Boilerplate {

  /** Per-document boilerplate profile: (id, n_shingles, n_boiler,
    * boiler_frac) — one row per document, including shingle-free (short)
    * docs with a 0.0 fraction. Ids follow the near-dup battery's bigint
    * contract. */
  def stats(df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 3, minDf: Long = 10): DataFrame =
    NearDup.materialized { cache =>
      val sh = cache(NearDup.hashedShingles(df, idCol, textCol, shingleLen))
      sh.count() // fill the shared cache before dependent branches race
      val ex = cache(sh.select(col("id"), explode(col("hs")).as("g")))
      val boiler = ex.groupBy(col("g"))
        .agg(count(lit(1)).as("df"))
        .filter(col("df") >= minDf)
        .select(col("g"))
      val perDoc = ex.join(boiler, Seq("g"))
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_boiler"))
      sh.select(col("id"), size(col("hs")).as("n_shingles"))
        .join(perDoc, Seq("id"), "left")
        .select(col("id"), col("n_shingles"),
          coalesce(col("n_boiler"), lit(0L)).as("n_boiler"),
          round(when(col("n_shingles") === 0, lit(0.0))
            .otherwise(coalesce(col("n_boiler"), lit(0L)) /
              col("n_shingles")), 4).as("boiler_frac"))
    }

  /** Corpus filtered to documents whose boilerplate fraction is below
    * `maxFrac` — the removal form of [[stats]]. */
  def prune(df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 3, minDf: Long = 10,
      maxFrac: Double = 0.5): DataFrame = {
    val bad = stats(df, idCol, textCol, shingleLen, minDf)
      .filter(col("boiler_frac") >= maxFrac)
      .select(col("id").as(idCol))
    df.join(bad, Seq(idCol), "left_anti")
  }
}
