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

  /** Cross-source contamination matrix — [[pairs]] rolled up to the
    * SOURCE level: for every (unordered) source pair, how many document
    * pairs share rare verbatim passages and how many shared grams in
    * total. The dataset-governance panel behind source selection ("srcA
    * and srcB are 40% mirror content — don't count them twice in the
    * mixture") and the cross-source face of L30's decontamination.
    *
    * Scale shape: the pair set is [[pairs]]' bounded output (orders of
    * magnitude smaller than the corpus); the two source lookups join a
    * slim (id, source) projection key-partitioned on bigint ids; the
    * final aggregate is grid-sized (|sources|² upper bound). Source
    * pairs are canonically ordered (least/greatest — string order is an
    * engine-portable total order), so intra-source duplication shows on
    * the diagonal rows. */
  def sourceMatrix(df: DataFrame, idCol: String, textCol: String,
      srcCol: String, shingleLen: Int = 8, maxDf: Int = 5,
      minShared: Int = 1): DataFrame = {
    val p = pairs(df, idCol, textCol, shingleLen, maxDf, minShared)
    val src = df.select(col(idCol).cast("long").as("__id"),
      col(srcCol).as("__src"))
    p.join(src.select(col("__id").as("id_a"), col("__src").as("__sa")), "id_a")
      .join(src.select(col("__id").as("id_b"), col("__src").as("__sb")), "id_b")
      .select(least(col("__sa"), col("__sb")).as("src_a"),
        greatest(col("__sa"), col("__sb")).as("src_b"), col("n_shared"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("n_shared")).cast("long").as("n_shared_total"))
  }

  /** Longest shared verbatim token run per candidate pair (VERDICT r6
    * #6) — the CONTAMINATION-LENGTH signal [[pairs]] deliberately does
    * not carry: `n_shared` counts distinct rare n-grams (presence), and
    * whole-doc similarity (MinHash, L2) can't see a single long quote
    * either; training pipelines filter on "how MUCH is copied", which is
    * this number.
    *
    * Semantics: candidate pairs are documents sharing ≥1 rare
    * (2 ≤ df ≤ maxDf) `shingleLen`-gram — exactly [[pairs]] at
    * `minShared = 1`, so the candidate set stays bounded by the same
    * rarity cap and the result is oracle-checkable with no recall
    * budget. For each candidate pair, `max_run` = the length in TOKENS
    * of the longest common token substring, computed EXACTLY from
    * position-ordered shingle hashes: equal hashes at positions (i, j)
    * certify an n-token match, a diagonal chain of L consecutive
    * matches certifies exactly L+n−1 shared tokens, and any common run
    * of R ≥ n tokens produces its R−n+1 chain — so
    * max_run = longest_chain + n − 1 equals the true LCS length
    * whenever LCS ≥ n, which candidacy guarantees (the shared rare gram
    * IS an n-token run). Ties to 64-bit hash collisions as everywhere
    * in the near-dup battery.
    *
    * Scale shape: candidate generation is [[pairs]]' bounded machinery;
    * the growth stage joins the (small) pair set to per-doc positional
    * hash arrays — two hash joins where AQE broadcasts the pair side —
    * and runs a JIT'd per-pair diagonal DP (O(matches) via a j-indexed
    * run-length map, never an |a|×|b| table). Nothing collects; the
    * quadratic surface (per-gram pair expansion) stays capped by maxDf
    * exactly as in [[pairs]]. */
  def maxSharedRun(df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 8, maxDf: Int = 5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cand = pairs(df, idCol, textCol, shingleLen, maxDf, minShared = 1)
      .select(col("id_a"), col("id_b"))
    // token hashes staged as their OWN projection (the sibling pattern
    // in NearDup.hashedShingles): CollapseProject keeps the non-cheap
    // transform staged, so the ~8n `th` references in the shingle lambda
    // read a materialized array instead of re-tokenizing per reference
    val posSh = df
      .select(col(idCol).cast("long").as("id"),
        graft.functions.TextAnalysis.tokenHashes(col(textCol)).as("th"))
      .select(col("id"), graft.functions.TextAnalysis
        .positionalShingleHashesFromTokens(col("th"), shingleLen).as("ps"))
    cand
      .join(posSh.select(col("id").as("id_a"), col("ps").as("psa")), "id_a")
      .join(posSh.select(col("id").as("id_b"), col("ps").as("psb")), "id_b")
      .select(col("id_a"), col("id_b"), col("psa"), col("psb"))
      .as[(Long, Long, Array[Long], Array[Long])]
      .mapPartitions(_.map { case (a, b, pa, pb) =>
        // positions of each hash in b
        val posB = new java.util.HashMap[Long, java.util.ArrayList[Int]]()
        var j = 0
        while (j < pb.length) {
          var l = posB.get(pb(j))
          if (l == null) { l = new java.util.ArrayList[Int](); posB.put(pb(j), l) }
          l.add(j); j += 1
        }
        // diagonal run DP, scanning i descending: len(i, j) =
        // 1 + len(i+1, j+1); only the previous row's j→len map lives
        var best = 0
        var next = new java.util.HashMap[Int, Int]()
        var i = pa.length - 1
        while (i >= 0) {
          val cur = new java.util.HashMap[Int, Int]()
          val js = posB.get(pa(i))
          if (js != null) {
            var x = 0
            while (x < js.size()) {
              val jj = js.get(x)
              val len = 1 + next.getOrDefault(jj + 1, 0)
              cur.put(jj, len)
              if (len > best) best = len
              x += 1
            }
          }
          next = cur
          i -= 1
        }
        (a, b, best.toLong + (shingleLen - 1))
      })
      .toDF("id_a", "id_b", "max_run")
  }
}
