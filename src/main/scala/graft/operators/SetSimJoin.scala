package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join with prefix filtering — the AllPairs /
  * PPJoin family (Bayardo et al., WWW'07; Vernica et al., SIGMOD'10 for
  * the MapReduce formulation): every document pair with shingle-set
  * Jaccard ≥ threshold, with **100% recall guaranteed by construction**.
  *
  * This is the deterministic complement to the MinHash-LSH path
  * ([[NearDup.minhashPairs]]): banding recall is probabilistic
  * (P[detect] = 1−(1−j^r)^b — near 1 but not 1), while the prefix
  * filter is a *lossless* candidate screen, so the output is exactly
  * the exhaustive all-pairs answer at any threshold. The price is that
  * candidate volume tracks token-frequency skew instead of a tunable
  * band count — use this when an auditable "no pair missed" guarantee
  * matters (decontamination evidence, dedup compliance reports), LSH
  * when approximate recall at controlled cost is enough.
  *
  * Algorithm: order each document's distinct shingle hashes by global
  * rarity (document frequency asc, hash asc — one corpus-wide order);
  * a pair with Jaccard ≥ t must share ≥ ⌈t·|A|⌉ shingles with EACH side
  * A (|∩| ≥ t·|∪| ≥ t·|A|), so if none of the first
  * p_A = |A| − ⌈t·|A|⌉ + 1 ordered shingles of A were shared, the ≥⌈t·|A|⌉
  * shared ones would have to fit in the remaining ⌈t·|A|⌉ − 1 slots —
  * contradiction. Moreover the GLOBALLY SMALLEST shared shingle is in
  * both prefixes (if it were past either prefix, that side's shared
  * set would again be squeezed into too few slots), so joining prefix
  * tokens against prefix tokens loses nothing. Candidates then pass
  * the size filter (min·10⁶ ≥ t₆·max — necessary since |∩| ≤ min and
  * |∪| ≥ max) and the exact [[NearDup.confirmJaccard]] verification.
  *
  * Scale shape: document frequency is one map-side-combinable groupBy
  * over exploded shingle hashes; per-set ordering is one
  * sort_array(collect_list) — deterministic because (df, hash) is
  * unique within a set; pair generation reuses [[NearDup.bucketPairs]]
  * (one groupBy, JIT'd in-bucket expansion, never a self-join of the
  * corpus). The rarest-first order is what bounds the quadratic term:
  * a shingle lands in a prefix only when it is among that document's
  * (1−t) rarest fraction, so corpus-wide boilerplate shingles appear in
  * prefixes only for documents consisting almost entirely of such
  * shingles — i.e. for genuine mass-duplicate clusters, where the
  * output itself is quadratic. `maxTokenGroup` is the robustness valve
  * for that regime (drops pair expansion for prefix-token groups above
  * the cap, reported by [[NearDup.bucketPairs]] semantics): the
  * default Int.MaxValue keeps the join exact; capped runs trade the
  * recall guarantee for bounded cost exactly like LSH's bucket cap.
  *
  * Reference anchor: the near-dup surface of the reference's dedup
  * checks (qb_invoices_backfill `transform_dedup.py` drops exact key
  * duplicates); this operator is the corpus-scale exact-similarity
  * generalization the LLM-data extension ships alongside L2/L44. */
object SetSimJoin {

  /** (id_a, id_b, jaccard) for every unordered pair with exact distinct
    * `shingleLen`-gram Jaccard ≥ `threshold`, id_a < id_b, jaccard
    * rounded to 6 dp (the near-dup family's oracle convention). Ids must
    * be numeric (upcast to long — [[NearDup.bucketPairs]]'s contract)
    * and UNIQUE: duplicate ids would merge their shingle sets through
    * the per-id grouping and double-count document frequency (the
    * CorpusDiff precondition, same reason).
    * Empty shingle sets (documents shorter than `shingleLen` tokens)
    * never pair: their Jaccard is 0 by the family's convention. */
  def pairs(df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 3, threshold: Double = 0.8,
      maxTokenGroup: Int = Int.MaxValue): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold $threshold outside (0, 1] — at 0 the prefix is the " +
        "whole set and the join is all-pairs by definition")
    // integer ppm form so the prefix/size arithmetic is exact: a float
    // ceil(t·n) landing one short would silently break the recall proof
    val t6 = math.round(threshold * 1e6)
    NearDup.materialized { cache =>
      val sh = cache(NearDup.hashedShingles(df, idCol, textCol, shingleLen))
      sh.count() // fill the shared cache before branches race on it
      // outer + null filter (the q_t6 InferFiltersFromGenerate lesson):
      // plain explode over the computed shingle array would re-evaluate
      // it inside an inferred size()>0 pushdown
      val ex = sh.select(col("id"), explode_outer(col("hs")).as("g"))
        .filter(col("g").isNotNull)
      // document frequency per shingle hash — `hs` is distinct within a
      // document, so count(1) IS the number of documents carrying g
      val dfreq = ex.groupBy(col("g")).agg(count(lit(1)).as("df"))
      // per-document global-rarity order; (df, g) is unique within a set,
      // so sort_array makes the collect_list order irrelevant
      val ordered = ex.join(dfreq, "g")
        .groupBy(col("id"))
        .agg(sort_array(collect_list(struct(col("df"), col("g")))).as("ord"))
      // p = n − ⌈t·n⌉ + 1 with the ceil as exact long arithmetic
      val n = size(col("ord")).cast("long")
      val ceilT = call_function("div", lit(t6) * n + lit(999999L),
        lit(1000000L))
      val prefixRows = ordered
        .select(col("id"), lit(0).as("band"),
          explode_outer(slice(transform(col("ord"), _.getField("g")),
            lit(1), (n - ceilT + lit(1L)).cast("int"))).as("key"))
        .filter(col("key").isNotNull)
      val cand = NearDup.bucketPairs(prefixRows, maxTokenGroup)
      // size filter: J ≥ t forces min(|A|,|B|)·10⁶ ≥ t₆·max(|A|,|B|);
      // the size table is two slim columns — AQE broadcasts it into
      // both probes when small, and the filter runs before the (more
      // expensive) shingle-set confirm either way
      val sizes = sh.select(col("id"), size(col("hs")).cast("long").as("n"))
      val sized = cand
        .join(sizes.select(col("id").as("id_a"), col("n").as("__na")), "id_a")
        .join(sizes.select(col("id").as("id_b"), col("n").as("__nb")), "id_b")
        .filter(least(col("__na"), col("__nb")) * lit(1000000L) >=
          lit(t6) * greatest(col("__na"), col("__nb")))
        .select(col("id_a"), col("id_b"))
      NearDup.confirmJaccard(cache(sized), sh, threshold)
    }
  }
}
