package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact edit-distance self-join via deletion-neighborhood blocking —
  * the entity-resolution primitive (find records whose KEY STRINGS are
  * within Levenshtein distance d: typo'd names, OCR'd ids, re-keyed
  * vendors). The blocking is the FastSS / SymSpell construction
  * (Bocek et al., 2007; Garbe's SymSpell): every string generates all
  * variants reachable by deleting ≤ d characters, and any pair within
  * edit distance d shares at least one variant — delete the characters
  * touched by the optimal edit script from each side and both collapse
  * to a common string with ≤ d deletions per side. So the candidate
  * screen is LOSSLESS (100% recall, the L63 property replayed for edit
  * distance) and the exact `levenshtein` confirm makes precision exact
  * too.
  *
  * Scale shape: variant generation is a narrow JIT'd flatMap — a
  * length-L string emits C(L,≤d)+1 variants (L=20, d=1 → 21; d=2 →
  * 211), hashed to 64 bits in the kernel so the shuffle ships (hash,
  * id) pairs, never variant strings; hash collisions only ADD
  * candidates (the confirm drops them), so hashing cannot cost
  * correctness. Candidate pairs ride [[NearDup.bucketPairs]]'s capped
  * in-bucket expansion (one groupBy, no self-join of the corpus) — a
  * name shared verbatim by k records is a genuine k-clique and the cap
  * is the documented valve, exactly the banding family's contract. The
  * confirm joins the slim (id, string) projection twice, key-
  * partitioned on bigint ids.
  *
  * `maxDist` is meant for 1-2 (variant count grows as C(L,d); SymSpell's
  * own guidance) — guarded at ≤ 3. */
object FuzzyJoin {

  /** All strings reachable from `s` by deleting at most `d` characters
    * (including `s` itself), deduplicated. */
  private[operators] def deletionVariants(s: String, d: Int): Set[String] = {
    var frontier = Set(s)
    var all = Set(s)
    var round = 0
    while (round < d) {
      frontier = frontier.flatMap { v =>
        (0 until v.length).iterator
          .map(i => v.substring(0, i) + v.substring(i + 1)).toSet
      } -- all
      all ++= frontier
      round += 1
    }
    all
  }

  /** (id_a, id_b, dist) for every unordered pair of rows whose `strCol`
    * values are within Levenshtein distance `maxDist` (id_a < id_b,
    * dist the exact distance). Null ids, null strings and strings
    * longer than `maxLen` are dropped (no stable identity / nothing to
    * match / not a key — see the valve note below); ids follow the pair
    * family's bigint contract and must be UNIQUE (a duplicate id would
    * fan out through the confirm's string lookups — the CorpusDiff
    * precondition). `maxBucketSize` caps a single blocking bucket's
    * pair expansion — the mass-duplicate-key valve. */
  /** Cross-table record linkage — (left_id, right_id, dist) for every
    * LEFT×RIGHT pair within Levenshtein distance `maxDist`: the A–B
    * matching shape of entity resolution (new batch vs master table,
    * two vendors' catalogs). Same lossless deletion-neighborhood screen;
    * candidates come from an equi-join of the two variant sets (id
    * spaces stay separate — no shared-pool remapping, so colliding
    * numeric ids across tables are safe), `maxVariantDf` caps a single
    * variant's per-side fan-in (the mass-duplicate valve: a name shared
    * by k_l × k_r records is a genuine biclique). Null/overlong strings
    * and null ids drop as in [[selfPairs]]; ids must be unique within
    * each side. */
  def pairs(left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String,
      maxDist: Int = 1, maxVariantDf: Int = 10000,
      maxLen: Int = 256): DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      s"maxDist $maxDist outside [0, 3] — variant count is C(len, d)")
    val lv = variantRows(left, leftId, leftStr, maxDist, maxLen)
    val rv = variantRows(right, rightId, rightStr, maxDist, maxLen)
    def capped(v: DataFrame): DataFrame = {
      val hot = v.groupBy(col("key")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") > maxVariantDf).select(col("key"))
      v.join(hot, Seq("key"), "left_anti")
    }
    val cand = capped(lv).select(col("key"), col("id").as("left_id"))
      .join(capped(rv).select(col("key"), col("id").as("right_id")), "key")
      .select(col("left_id"), col("right_id")).distinct()
    val ls = left.filter(col(leftId).isNotNull && col(leftStr).isNotNull)
      .select(col(leftId).cast("long").as("left_id"),
        col(leftStr).as("__sl"))
    val rs = right.filter(col(rightId).isNotNull && col(rightStr).isNotNull)
      .select(col(rightId).cast("long").as("right_id"),
        col(rightStr).as("__sr"))
    cand.join(ls, "left_id").join(rs, "right_id")
      .select(col("left_id"), col("right_id"),
        levenshtein(col("__sl"), col("__sr")).as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** (key, id) deletion-variant rows for one side — the shared screen. */
  private def variantRows(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, maxLen: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col(idCol).isNotNull && col(strCol).isNotNull &&
        length(col(strCol)) <= maxLen)
      .select(col(idCol).cast("long"), col(strCol))
      .as[(Long, String)].mapPartitions { it =>
        it.flatMap { case (id, s) =>
          deletionVariants(s, maxDist).iterator.map(v => (hash64(v), id))
        }
      }.toDF("key", "id")
  }

  /** 64-bit combine of (length, murmur3): deterministic across JVMs;
    * collisions merge candidate buckets, which only ADDS candidates. */
  private def hash64(v: String): Long =
    (v.length.toLong << 32) ^
      (scala.util.hashing.MurmurHash3.stringHash(v).toLong & 0xffffffffL)

  def selfPairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 1, maxBucketSize: Int = 10000,
      maxLen: Int = 256): DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      s"maxDist $maxDist outside [0, 3] — variant count is C(len, d)")
    require(maxLen >= 1, s"maxLen $maxLen must be >= 1")
    // the length valve (review-caught skew bomb: ONE 10-KB string at
    // d=2 would emit ~C(10⁴,2) ≈ 5·10⁷ variants from a single row —
    // entity KEYS are short by nature) lives in variantRows, shared
    // with the cross-table form
    val vr = variantRows(df, idCol, strCol, maxDist, maxLen)
      .withColumn("band", lit(0))
    val cand = NearDup.bucketPairs(vr, maxBucketSize)
    val strs = df.filter(col(idCol).isNotNull && col(strCol).isNotNull)
      .select(col(idCol).cast("long").as("__id"), col(strCol).as("__s"))
    cand
      .join(strs.select(col("__id").as("id_a"), col("__s").as("__sa")), "id_a")
      .join(strs.select(col("__id").as("id_b"), col("__s").as("__sb")), "id_b")
      .select(col("id_a"), col("id_b"),
        levenshtein(col("__sa"), col("__sb")).as("dist"))
      .filter(col("dist") <= maxDist)
  }
}
