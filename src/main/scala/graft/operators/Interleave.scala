package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic proportional interleave — the training data-loader
  * order: documents from S sources emitted in one global sequence where
  * source s takes w_s of every Σw slots, spread evenly (weighted fair
  * queueing / start-time fair scheduling, the deterministic form of
  * tf.data's `sample_from_datasets`). The mixture operators (L26/L50)
  * decide HOW MANY documents each source contributes; this decides the
  * ORDER they reach the trainer — a badly interleaved stream feeds the
  * model a source-homogeneous curriculum even when the aggregate
  * mixture is right, and a RANDOM interleave is not reproducible across
  * reruns/engines. Here position is a pure function of the data:
  *
  *   r = hash-rank of the doc within its source ([[Ranking]] — skew
  *       -free), virtual time v(s, r) = (r+1) / w_s, and the global
  *   pos = |{(s', r') : v' < v, or v' = v and s' < s}|
  *       — the rank of each doc under (v, source, r) order, computed in
  *       CLOSED FORM with integer arithmetic only (cross-multiplied
  *       rational comparisons, no float):
  *   pos(s, r) = r + Σ_{s'≠s} [ min(n_s', ⌊((r+1)·w_s' − 1) / w_s⌋)
  *               + (s' < s ∧ w_s | (r+1)·w_s' ∧ (r+1)·w_s'/w_s ≤ n_s') ]
  *
  * Scale shape: per-source (w, n) stats are GRID-sized and fold into
  * the position expression as literals — after the one ranking
  * shuffle, position is a NARROW codegen'd projection, no sort of the
  * corpus by v, no join. The literal fold carries |S|² terms (each
  * row's source selects its branch over S−1 others); past ~10³ sources
  * the same Σ should ride an exploded (doc × source) grid join instead
  * — a documented cutover, not a cliff. Weights are positive integers
  * (ratios, not floats) and constant per source (checked). */
object Interleave {

  /** (input columns…, r, pos): `r` the deterministic hash-rank within
    * the source, `pos` the 0-based global interleave position. The
    * total order key within a source is (md5(id-as-string), id) — the
    * engine-portable hash order (the q_e5 convention); `idCol` must be
    * unique corpus-wide and non-null, sources non-null. */
  def positions(df: DataFrame, srcCol: String, idCol: String,
      weightOf: Column): DataFrame = {
    // the Privacy/Ranking reserved-column discipline: a silent clobber
    // of a user column is worse than a refusal
    Seq("__w", "pos", "r").foreach(c => require(!df.columns.contains(c),
      s"input column '$c' collides with an interleave output/temp column"))
    val base = df.filter(col(srcCol).isNotNull && col(idCol).isNotNull)
      .withColumn("__w", weightOf.cast("long"))
    val ranked = Ranking.indexWithinGroups(base, srcCol,
      Seq(md5(col(idCol).cast("string")), col(idCol)), out = "r")
    val stats = ranked.groupBy(col(srcCol))
      .agg(count(lit(1)).as("n"), min(col("__w")).as("w"),
        max(col("__w")).as("wmax"))
      .collect() // bounded: |sources|
      .map { r =>
        val (s, n, w, wmax) =
          (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
        require(w == wmax, s"weight not constant within source '$s'")
        require(w >= 1, s"weight of source '$s' must be a positive integer")
        (s, w, n)
      }.sortBy(_._1).toIndexedSeq
    val rp1 = col("r") + lit(1L)
    val terms: Seq[Column] = stats.map { case (sj, wj, nj) =>
      // integer DIV, as the contract says — Column./ is DOUBLE division
      // and past 2^53 the quotient could round across an integer
      // boundary (all operands here are positive, so DIV == floor)
      val before = least(lit(nj),
        expr(s"((r + 1) * ${wj}L - 1L) DIV __w"))
      val kq = expr(s"((r + 1) * ${wj}L) DIV __w")
      val tie = when(lit(sj) < col(srcCol) &&
        kq * col("__w") === rp1 * lit(wj) && kq <= lit(nj), lit(1L))
        .otherwise(lit(0L))
      when(col(srcCol) === lit(sj), lit(0L)).otherwise(before + tie)
    }
    ranked.withColumn("pos",
        terms.foldLeft(col("r"))(_ + _))
      .drop("__w")
  }
}
