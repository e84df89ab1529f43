package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the eval-set hygiene step of a training
  * pipeline: find (and remove) training documents that share any n-gram
  * with an evaluation corpus, so benchmark answers don't leak into
  * training data.
  *
  * Exact by design, unlike the near-dup family: contamination is a
  * membership question (does this doc contain an eval n-gram?), not a
  * similarity question, so there is no sketch/recall trade — the check is
  * a set intersection and the oracle can recompute it verbatim.
  *
  * Scale shape: the eval corpus is SMALL by definition (benchmarks are
  * thousands of documents, not billions), so its distinct shingle-hash
  * set broadcasts; the training corpus is scanned ONCE, its exploded
  * shingles hash-joined against the broadcast set with no shuffle of the
  * corpus itself. Shingles ride as 64-bit hashes (xxhash64, fixed seeds —
  * `TextAnalysis.shingleHashesFromTokens`), so the broadcast is 8 bytes
  * per eval n-gram and the comparison is a long equality, not a string
  * match. A 10⁹-shingle eval set would outgrow the broadcast — at that
  * point drop the hint and let the same plan run as a shuffled semi-join.
  */
object Decontaminate {

  /** Per-training-document count of DISTINCT n-gram shingles shared with
    * the eval corpus — only contaminated docs (overlap > 0) are returned,
    * as ("id", "n_overlap"). Ids follow the near-dup battery's bigint
    * contract. */
  def overlaps(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, shingleLen: Int = 8): DataFrame = {
    val evalGrams = explodedGrams(
      NearDup.hashedShingles(eval, idCol, textCol, shingleLen))
      .select(col("g")).distinct()
    explodedGrams(NearDup.hashedShingles(train, idCol, textCol, shingleLen))
      .join(broadcast(evalGrams), Seq("g"))
      // hs is per-doc distinct, so the plain count IS the distinct-shingle
      // overlap — no row-wide distinct needed
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_overlap"))
  }

  /** [[overlaps]] with a Bloom-filter pre-screen — identical output (the
    * screen's false positives are removed by the exact confirm join, and
    * false negatives are impossible by construction), different scale
    * envelope: the screening predicate is a CONSTANT-size sketch probe
    * (sized by `fpp` and the eval shingle count, never by the corpus), so
    * the stream of corpus shingles that reaches the confirm join shrinks
    * from "all of them" to "true matches + fpp stragglers". With the
    * default broadcast confirm that saves join-probe work; when an eval
    * set is too big to broadcast and the confirm must run as a SHUFFLED
    * semi-join, it is the difference between shuffling 100 TB of corpus
    * shingles and shuffling approximately nothing — the same pattern
    * Spark's own runtime-injected bloom filters apply to shuffle joins.
    * The probe is a native codegen expression
    * ([[graft.expressions.BloomMightContain]]); the filter bits ride the
    * closure once per task, not per row. */
  def overlapsBloomScreened(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, shingleLen: Int = 8,
      fpp: Double = 0.01): DataFrame = NearDup.materialized { cache =>
    val evalGrams = cache(explodedGrams(
      NearDup.hashedShingles(eval, idCol, textCol, shingleLen))
      .select(col("g")).distinct())
    // sizing count doubles as the cache-materializing action
    val nGrams = math.max(1L, evalGrams.count())
    val bloom = graft.functions.LongBloom.build(evalGrams, "g", nGrams, fpp)
    val screen = org.apache.spark.sql.GraftBridge.column(
      graft.expressions.BloomMightContain(
        org.apache.spark.sql.GraftBridge.expression(col("g")), bloom))
    explodedGrams(NearDup.hashedShingles(train, idCol, textCol, shingleLen))
      .filter(screen)
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_overlap"))
  }

  /** ("id", "hs") → one ("id", "g") row per shingle, via a typed
    * mapPartitions instead of `explode`. The typed boundary is an
    * optimizer barrier, and here that is the point, not a side effect:
    * with a Catalyst Generate, the inner join's inferred `IsNotNull(g)`
    * constraint is pushed below the explode into the SCAN filter, where
    * alias substitution inlines the whole tokenize→hash→shingle
    * expression — several times over, via each `element_at` — and the
    * scan re-shingles every row quadratically (measured: q_t9 19.4 s at
    * sf0.1; 0.6 s behind the barrier). Same defense the signature
    * kernels get from mapPartitions, same single narrow pass. */
  private def explodedGrams(d: DataFrame): DataFrame = {
    val spark = d.sparkSession
    import spark.implicits._
    d.select(col("id").cast("long"), col("hs")).as[(Long, Array[Long])]
      .mapPartitions(_.flatMap { case (id, hs) => hs.iterator.map((id, _)) })
      .toDF("id", "g")
  }

  /** Removal form symmetric with [[Boilerplate.prune]]: drop training
    * docs whose distinct-shingle overlap with the eval corpus reaches
    * `minOverlap`. The default (1) drops on ANY shared n-gram — the
    * conservative eval-hygiene posture; a higher threshold tolerates
    * incidental collisions on common long phrases when `shingleLen` had
    * to be short. */
  def prune(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, shingleLen: Int = 8,
      minOverlap: Long = 1L): DataFrame = {
    require(minOverlap >= 1, s"minOverlap $minOverlap must be >= 1")
    train.join(
      overlaps(train, eval, idCol, textCol, shingleLen)
        .filter(col("n_overlap") >= minOverlap)
        .select(col("id").as(idCol)),
      Seq(idCol), "left_anti")
  }

  /** Training corpus with every contaminated document removed —
    * [[prune]] at its conservative default. */
  def clean(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, shingleLen: Int = 8): DataFrame =
    prune(train, eval, idCol, textCol, shingleLen)
}
