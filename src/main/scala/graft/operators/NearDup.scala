package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Near-duplicate detection for LLM training corpora (BASELINE.json north
  * star): exact content dedup, MinHash + LSH banding, SimHash + Hamming
  * banding, and exact n-gram Jaccard confirmation.
  *
  * Scale design — the cardinal rule is NEVER all-pairs. Both sketches reduce
  * O(n²) comparison to:
  *   1. a per-row signature (narrow, codegen'd, no shuffle),
  *   2. an explode to (bandIndex, bandKey) and a self-equi-join on that pair
  *      — a hash-shuffle bucket join whose cost is the candidate count, not
  *      n²; docs that share no band never meet,
  *   3. exact Jaccard confirmation on the (few) candidate pairs only.
  * At 100 TB: signatures are one scan; the band join shuffles
  * O(n · bands) small rows; hot buckets (boilerplate docs) can be salted or
  * capped via a per-bucket count filter before the join.
  *
  * Determinism: hash family is `xxhash64(seed_i, shingle)` — fixed seeds,
  * no RNG state, so signatures are reproducible across runs/partitionings
  * (unlike `org.apache.spark.ml.feature.MinHashLSH`'s random coefficients).
  */
object NearDup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup by normalized content (md5 fingerprint): keeps, per
    * distinct text, the row with the smallest `idCol` — deterministic
    * keeper, single hash-shuffle on the fingerprint. */
  def exactByContent(df: DataFrame, textCol: String, idCol: String): DataFrame =
    Dedup.firstByKey(
      df.withColumn("__fp", TextAnalysis.fingerprint(col(textCol))),
      "__fp", idCol).drop("__fp")

  // -------------------------------------------------------------- minhash

  /** k-element MinHash signature of a shingle-set column:
    * sig[i] = min over shingles of xxhash64(i, shingle). Empty shingle sets
    * get null (excluded from candidate generation). */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    when(size(shingles) === 0, lit(null))
      .otherwise(array((0 until numHashes).map(i =>
        array_min(transform(shingles, s => xxhash64(lit(i), s)))): _*))

  /** (bandIndex, bandKey) pairs for LSH banding: the signature is split into
    * `bands` contiguous bands of `numHashes/bands` hashes; each band hashes
    * to one 64-bit key. Two docs collide iff some band is identical. */
  def bandKeys(sig: Column, numHashes: Int, bands: Int): Column = {
    val r = numHashes / bands
    array((0 until bands).map(b =>
      struct(lit(b).as("band"), xxhash64(lit(b), slice(sig, b * r + 1, r)).as("key"))): _*)
  }

  /** Candidate id pairs (a < b) from MinHash-LSH banding — the scale-safe
    * candidate generator: explode to one row per band, self-join on
    * (band, key), dedup pairs. */
  def minhashCandidates(df: DataFrame, idCol: String, shinglesCol: String,
      numHashes: Int = 128, bands: Int = 32): DataFrame = {
    val sigd = df.select(col(idCol).as("id"),
        minhashSignature(col(shinglesCol), numHashes).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("id"), explode(bandKeys(col("sig"), numHashes, bands)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val a = sigd.select(col("band"), col("key"), col("id").as("id_a"))
    val b = sigd.select(col("band"), col("key"), col("id").as("id_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** MinHash-LSH near-duplicate pairs with exact confirmation: candidates
    * from banding, then exact n-word-shingle Jaccard, keep >= `threshold`.
    * Output: (id_a, id_b, jaccard) — deterministic, so it is oracle-checkable
    * against an exhaustive exact computation. Candidate recall: P[detect] =
    * 1-(1-j^r)^b; at the defaults (r=4, b=32) j=0.7 → 0.9998, j=0.9 → ~1. */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 3, threshold: Double = 0.5,
      numHashes: Int = 128, bands: Int = 32): DataFrame = {
    // sh is read twice (candidates + confirm) — both are narrow rescans of
    // the source; callers composing longer pipelines can persist upstream.
    val sh = df.select(col(idCol).as("id"),
      TextAnalysis.wordShingles(col(textCol), shingleLen).as("sh"))
    confirmJaccard(minhashCandidates(sh, "id", "sh", numHashes, bands),
      sh, threshold)
  }

  /** Join candidate pairs back to their shingle sets and keep pairs with
    * exact Jaccard >= threshold. Only candidate pairs are scored — never
    * all-pairs. */
  def confirmJaccard(pairs: DataFrame, shingles: DataFrame,
      threshold: Double): DataFrame = {
    val sa = shingles.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val sb = shingles.select(col("id").as("id_b"), col("sh").as("sh_b"))
    pairs.join(sa, "id_a").join(sb, "id_b")
      .select(col("id_a"), col("id_b"),
        round(TextAnalysis.jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // -------------------------------------------------------------- simhash

  /** 64-bit SimHash of a shingle set, via explode + per-bit majority vote:
    * bit j of the result is 1 iff Σ_s sign(bit_j(xxhash64(s))) > 0.
    * Distributed as one hash-shuffle groupBy on id (64 partial-agg sums
    * ride the same shuffle). Returns (idCol, simhash). */
  def simhashSignatures(df: DataFrame, idCol: String, shinglesCol: String): DataFrame = {
    val h = df.select(col(idCol).as("id"),
        explode(col(shinglesCol)).as("s"))
      .withColumn("h", xxhash64(col("s")))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"b$j")
    }
    h.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"),
        (0 until 64).map(j =>
          when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(0L))
          .reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** SimHash near-duplicate pairs: band the 64-bit signature into
    * `chunks` pieces (pigeonhole: hamming < chunks ⇒ some chunk equal),
    * join on (chunkIdx, chunkValue), confirm hamming <= maxHamming, then
    * exact-Jaccard confirm >= threshold (same contract as [[minhashPairs]]).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 3, maxHamming: Int = 15, chunks: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    require(64 % chunks == 0, "chunks must divide 64")
    val w = 64 / chunks
    val sh = df.select(col(idCol).as("id"),
      TextAnalysis.wordShingles(col(textCol), shingleLen).as("sh"))
    val sig = simhashSignatures(sh.filter(size(col("sh")) > 0), "id", "sh")
    val chunked = sig.select(col("id"), col("simhash"),
        explode(array((0 until chunks).map(i =>
          struct(lit(i).as("ci"),
            shiftright(col("simhash"), i * w)
              .bitwiseAND((1L << w) - 1).as("cv"))): _*)).as("c"))
      .select(col("id"), col("simhash"), col("c.ci").as("ci"), col("c.cv").as("cv"))
    val a = chunked.select(col("ci"), col("cv"),
      col("id").as("id_a"), col("simhash").as("sim_a"))
    val b = chunked.select(col("ci"), col("cv"),
      col("id").as("id_b"), col("simhash").as("sim_b"))
    val cand = a.join(b, Seq("ci", "cv"))
      .filter(col("id_a") < col("id_b"))
      .filter(bit_count(col("sim_a").bitwiseXOR(col("sim_b"))) <= maxHamming)
      .select(col("id_a"), col("id_b")).distinct()
    confirmJaccard(cand, sh, threshold)
  }
}
