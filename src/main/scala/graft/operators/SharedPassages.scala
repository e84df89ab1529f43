package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared-passage detection — document pairs that quote each other
  * verbatim. Whole-document near-dup (MinHash/SimHash) misses these by
  * design: two long articles sharing one copied paragraph sit far below
  * any Jaccard threshold. The passage signal is the n-gram inverted
  * index: two documents sharing any RARE n-gram share a verbatim token
  * run of at least n tokens.
  *
  * Rarity (df <= maxDf) is load-bearing twice over:
  *  - semantically: high-df n-grams are boilerplate/common phrases, not
  *    copied passages (the [[Boilerplate]] operator owns that signal);
  *  - mechanically: the per-gram pair expansion is bounded by
  *    maxDf·(maxDf-1)/2, so no posting list ever goes quadratic — the
  *    same hot-bucket discipline as the near-dup banding cap, but here
  *    the cap is part of the DECLARED semantics, so the oracle replicates
  *    it exactly and the result is oracle-checkable (no recall budget).
  *
  * Scale shape: shingle once (cached), one df aggregation keyed on the
  * 64-bit gram hash, join of the exploded grams against the rare set,
  * one bounded typed pair expansion, one (id_a, id_b) count aggregation.
  * All shuffles carry narrow bigint keys; nothing broadcasts the corpus
  * or collects. */
object SharedPassages {

  /** (id_a, id_b, n_shared) with id_a < id_b — `n_shared` counts the
    * DISTINCT rare n-grams (2 <= df <= maxDf) the two documents share;
    * pairs below `minShared` are dropped. Ids follow the near-dup
    * battery's bigint contract. */
  def pairs(df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 8, maxDf: Int = 5, minShared: Int = 1): DataFrame =
    NearDup.materialized { cache =>
      val spark = df.sparkSession
      import spark.implicits._
      val sh = cache(NearDup.hashedShingles(df, idCol, textCol, shingleLen))
      sh.count() // fill the shared cache before dependent branches race
      val ex = cache(sh.select(col("id"), explode(col("hs")).as("g")))
      // hs is per-doc distinct, so COUNT(*) per gram IS its document
      // frequency; df >= 2 (shared at all) and <= maxDf (rare)
      val rare = ex.groupBy(col("g"))
        .agg(count(lit(1)).as("df"))
        .filter(col("df").between(2, maxDf))
        .select(col("g"))
      ex.join(rare, Seq("g"))
        .groupBy(col("g"))
        .agg(sort_array(collect_set(col("id").cast("long"))).as("ids"))
        .select(col("ids")).as[Array[Long]]
        .mapPartitions(_.flatMap { ids =>
          // bounded: |ids| <= maxDf by the rarity filter
          for {
            i <- ids.indices.iterator
            j <- (i + 1) until ids.length
          } yield (ids(i), ids(j))
        })
        .toDF("id_a", "id_b")
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= minShared)
    }
}
