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
  def selfPairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 1, maxBucketSize: Int = 10000,
      maxLen: Int = 256): DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      s"maxDist $maxDist outside [0, 3] — variant count is C(len, d)")
    require(maxLen >= 1, s"maxLen $maxLen must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    // length valve (review-caught skew bomb): ONE 10-KB string at d=2
    // would emit ~C(10⁴,2) ≈ 5·10⁷ variants from a single row. Entity
    // KEYS are short by nature; strings past `maxLen` don't participate
    // (documented drop, like the bucket cap — raise it deliberately,
    // never silently)
    val keyed = df.filter(col(idCol).isNotNull && col(strCol).isNotNull &&
        length(col(strCol)) <= maxLen)
      .select(col(idCol).cast("long"), col(strCol))
    val variantRows = keyed.as[(Long, String)].mapPartitions { it =>
      it.flatMap { case (id, s) =>
        deletionVariants(s, maxDist).iterator.map { v =>
          // 64-bit combine of (length, murmur3): deterministic across
          // JVMs; collisions merge buckets, which only adds candidates
          val h = (v.length.toLong << 32) ^
            (scala.util.hashing.MurmurHash3.stringHash(v).toLong & 0xffffffffL)
          (h, id)
        }
      }
    }.toDF("key", "id").withColumn("band", lit(0))
    val cand = NearDup.bucketPairs(variantRows, maxBucketSize)
    val strs = keyed.toDF("__id", "__s")
    cand
      .join(strs.select(col("__id").as("id_a"), col("__s").as("__sa")), "id_a")
      .join(strs.select(col("__id").as("id_b"), col("__s").as("__sb")), "id_b")
      .select(col("id_a"), col("id_b"),
        levenshtein(col("__sa"), col("__sb")).as("dist"))
      .filter(col("dist") <= maxDist)
  }
}
