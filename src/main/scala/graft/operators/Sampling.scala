package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and dataset splitting — the
  * train/validation/test split step of a training-data pipeline.
  *
  * Why not `df.sample()`/`randomSplit()`: those are seeded per-partition
  * RNG draws — the assignment of a ROW depends on how the data happens to
  * be partitioned, so re-running after a repartition (or on a grown
  * corpus) reshuffles examples between train and test, leaking test data
  * into training. Hashing the example's KEY makes membership a pure
  * function of identity: stable across runs, partitionings, engines and
  * corpus growth (a new document never moves an old one).
  *
  * Scale shape: a codegen'd md5 projection + string compare — narrow, no
  * shuffle, no state. md5 (not xxhash64) is deliberate: every engine
  * agrees on md5's hex form, so the same split can be reproduced in the
  * warehouse, in Spark, and in a Python loader reading the manifest.
  * Thresholds compare the first 4 hex chars (16 bits): split fractions
  * resolve to 1/65536 granularity, plenty for split ratios.
  */
object Sampling {

  /** First 4 hex chars of md5 of the key's string form — a deterministic,
    * engine-portable 16-bit bucket, as a lowercase hex string. */
  def hexBucket(key: Column): Column =
    substring(md5(key.cast("string").cast("binary")), 1, 4)

  /** Exclusive upper bound for `hexBucket < boundary` at the given keep
    * fraction. Fraction 1.0 returns "g" — lexicographically above every
    * 4-hex-char bucket (a 5-char "10000" would compare BELOW "ffff" and
    * drop rows; string comparison is per-char, not numeric). */
  private def hexBoundary(fraction: Double): String = {
    val b = math.round(math.floor(fraction * 65536.0))
    if (b >= 65536L) "g" else f"$b%04x"
  }

  /** Adds a `split` column assigning each row to exactly one named split.
    * `splits` are (name, fraction) in priority order; fractions must sum
    * to ≤ 1 and the LAST split absorbs any rounding remainder (so the
    * partition is total). Example:
    * `hashSplit(df, col("doc_id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))`. */
  def hashSplit(df: DataFrame, key: Column,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    require(splits.forall(_._2 > 0), "split fractions must be positive")
    val sum = splits.map(_._2).sum
    require(sum <= 1.0 + 1e-9, s"split fractions sum to $sum > 1")
    // Null keys are DROPPED, matching sampleByHash/mixture (their filters
    // are null-rejecting). Without this, md5(null) = null made every
    // comparison null and the CASE fell through to the LAST split — every
    // null-key row landed deterministically in 'test', the worst place to
    // leak unkeyed rows.
    val keyed = df.filter(key.isNotNull)
    val bucket = hexBucket(key)
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    // boundaries for all but the last split; the last takes the remainder
    val expr = splits.init.zip(cum.init).foldLeft(when(lit(false), "")) {
      case (acc, ((name, _), cumFrac)) =>
        acc.when(bucket < lit(hexBoundary(cumFrac)), name)
    }.otherwise(splits.last._1)
    keyed.withColumn("split", expr)
  }

  /** Keep a deterministic `rate` fraction of rows by key hash — the
    * corpus-subsampling primitive (same stability contract as
    * [[hashSplit]]): a row's fate depends only on its key. */
  def sampleByHash(df: DataFrame, key: Column, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate $rate outside [0,1]")
    if (rate >= 1.0) df
    else df.filter(hexBucket(key) < lit(hexBoundary(rate)))
  }

  /** Dataset mixing: per-group sampling rates in ONE pass — the
    * source-reweighting step of a pretraining mixture (keep 100% of
    * high-quality sources, a hash-stable fraction of the rest). A row
    * survives iff its key bucket clears its group's rate; groups absent
    * from `rates` get `defaultRate`. Same narrow no-shuffle shape as
    * [[sampleByHash]] — the rate lookup is a literal CASE chain, so one
    * scan mixes any number of sources (vs N filtered unions re-scanning
    * the corpus N times). */
  def mixture(df: DataFrame, groupCol: String, key: Column,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0 && r <= 1, s"rate $r outside [0,1]"))
    val boundary = rates.foldLeft(when(lit(false), "")) {
      case (acc, (g, r)) => acc.when(col(groupCol) === g, hexBoundary(r))
    }.otherwise(hexBoundary(defaultRate))
    df.filter(hexBucket(key) < boundary)
  }

  /** Keep at most `maxPerGroup` rows of each group, chosen by key-hash
    * order — the host/domain cap of web-corpus curation (no single site
    * may contribute more than N documents). Hash order (not "first N
    * seen") makes the kept subset a pure function of row identity: stable
    * across runs, partitionings and engines, and UNBIASED — insertion
    * order usually correlates with crawl time, so "first N" would keep
    * each domain's oldest pages.
    *
    * Scale shape: `rank <= k` over a `row_number` window is rewritten by
    * Spark into a WindowGroupLimit — each map task keeps only its local
    * top-k per group BEFORE the shuffle, so a group with 10⁹ rows ships
    * ~k·tasks rows, not 10⁹, and the post-shuffle sort is over capped
    * input (asserted in SamplingSpec). Null keys are dropped, matching
    * the other operators in this module. */
  def capPerGroup(df: DataFrame, groupCol: String, key: Column,
      maxPerGroup: Int): DataFrame = {
    require(maxPerGroup > 0, s"maxPerGroup $maxPerGroup must be positive")
    // Domain-separated hash ("cap:" prefix): the cap must NOT rank by the
    // same md5(key) that hexBucket buckets by, or the kept subset is
    // exactly the low-bucket rows and every downstream hash stage is
    // maximally biased — measured: cap-then-hashSplit yielded a 297/3/0
    // "80/10/10" split because the cap had already selected the
    // smallest-hash docs, which are precisely the train bucket.
    val ord = md5(concat(lit("cap:"), key.cast("string")).cast("binary"))
    // secondary sort on the key itself: md5 ties are cryptographically
    // implausible but the determinism contract shouldn't rest on that
    val w = Window.partitionBy(col(groupCol)).orderBy(ord, key)
    df.filter(key.isNotNull)
      .withColumn("__graft_rk", row_number().over(w))
      .filter(col("__graft_rk") <= maxPerGroup)
      .drop("__graft_rk")
  }

  /** Keep each group's rows — in domain-separated hash order, the same
    * stability contract as [[capPerGroup]] — until the group's running
    * token total reaches `maxTokensPerGroup`: the "fill each source to
    * its token budget" step of mixture construction, where budgets are
    * set in tokens (what the training run actually consumes), not
    * document counts. The budget-crossing row is KEPT (kept iff the
    * tokens BEFORE it are under budget), so every non-empty group with a
    * positive budget contributes at least one row and the kept total may
    * overshoot by at most one document. Rows with null keys or null
    * token counts drop.
    *
    * Scale shape: one hash shuffle on the group, a per-group sort, and a
    * RUNNING-sum frame (streaming, no buffering) — same shape as
    * sequence packing; no WindowGroupLimit rewrite exists for cumulative
    * predicates, so a 10⁹-row group does sort (spilling, parallel across
    * groups) — cap row counts first via [[capPerGroup]] if a group's raw
    * volume is itself the problem. */
  def capTokensPerGroup(df: DataFrame, groupCol: String, key: Column,
      tokens: Column, maxTokensPerGroup: Long): DataFrame = {
    require(maxTokensPerGroup > 0,
      s"maxTokensPerGroup $maxTokensPerGroup must be positive")
    // "budget:" domain separation for the same reason as capPerGroup's
    // "cap:" — ranking by the raw split/sample hash would bias every
    // downstream hash stage onto the kept subset
    val ord = md5(concat(lit("budget:"), key.cast("string")).cast("binary"))
    val w = Window.partitionBy(col(groupCol)).orderBy(ord, key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.filter(key.isNotNull && tokens.isNotNull)
      .withColumn("__graft_cum", sum(tokens).over(w))
      .filter(col("__graft_cum") - tokens < maxTokensPerGroup)
      .drop("__graft_cum")
  }

  /** EXACT per-group split proportions — [[hashSplit]] holds fractions
    * only in expectation, which drifts badly on small strata (a 30-doc
    * source can land 40/60 under a 80/20 split); here each group is
    * ranked by a domain-separated hash and the first
    * `floor(n·bits/65536)` rows of each cumulative boundary take the
    * split name, so every stratum honors the fractions to ±1 row. The
    * fractions must sum to 1 (the splits partition each stratum; the
    * last split is assigned by remainder, which only equals its nominal
    * fraction when the sum is 1).
    * Fractions resolve at [[hashSplit]]'s 1/65536 granularity; the
    * per-group keep count is `(n · bits) / 65536.0` floored — an exact
    * integer divided by a power of two, so the double math is EXACT and
    * engine-portable (no decimal-vs-binary 0.7·10 = 6.999… hazards).
    * Stability: within a group, membership moves only at the boundary
    * when the group grows (rank-based assignment cannot be pure-function
    * stable; when cross-run stability matters more than exactness, use
    * [[hashSplit]]).
    *
    * One hash shuffle on the group; rank and group count ride the same
    * window sort. */
  def stratifiedSplit(df: DataFrame, groupCol: String, key: Column,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    require(splits.forall(_._2 > 0), "split fractions must be positive")
    // the splits must PARTITION each stratum: the last split takes
    // whatever the cumulative boundaries left over, so a sum below 1
    // would silently hand it the remainder (0.5/0.2 → "test" gets 50%)
    // instead of its nominal fraction — reject rather than surprise
    // (ADVICE r5). To keep only part of a stratum, add an explicit
    // discard split and filter it out.
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) <= 1e-9,
      s"split fractions must sum to 1 (the last split receives the " +
        s"remainder), got $total")
    val cumBits = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(f => math.min(math.round(math.floor(f * 65536.0)), 65536L))
    val ord = md5(concat(lit("strat:"), key.cast("string")).cast("binary"))
    val w = Window.partitionBy(col(groupCol)).orderBy(ord, key)
    val wAll = Window.partitionBy(col(groupCol))
    val ranked = df.filter(key.isNotNull)
      .withColumn("__graft_rk", row_number().over(w))
      .withColumn("__graft_n", count(lit(1)).over(wAll))
    val expr = splits.init.zip(cumBits.init)
      .foldLeft(when(lit(false), "")) { case (acc, ((name, _), bits)) =>
        acc.when(col("__graft_rk") <=
          floor(col("__graft_n") * bits / 65536.0), name)
      }.otherwise(splits.last._1) // last split absorbs the remainder
    ranked.withColumn("split", expr).drop("__graft_rk", "__graft_n")
  }

  /** Deterministic global shuffle for training order, realized as
    * (`shard`, `shuffle_rank`) WITHOUT a global sort: the training
    * permutation is "order by md5(seed:key)", the shard is a contiguous
    * RANGE of that hash space (first 16 bits → `bucket * shards / 65536`),
    * and `shuffle_rank` is the row's position within its shard. Reading
    * shard 0..n-1 each in rank order therefore reproduces the exact
    * global hash order — but no stage ever sorts more than one shard.
    *
    * This is the "shuffle the corpus before training" step. Seeding via
    * the hash input (not an RNG) keeps the permutation a pure function of
    * (seed, key): re-runs, engine changes and corpus growth never move an
    * existing row relative to another, and a different seed is a fresh
    * permutation.
    *
    * Scale shape: one narrow md5 projection + one hash shuffle on `shard`
    * + a per-shard external sort (spills; parallel across shards). Size
    * `shards` so a shard ≈ one output file (corpus_bytes / target_file_
    * bytes); 16-bit granularity caps useful shards at 65536 — beyond
    * that, widen the bucket slice. */
  def shuffleShard(df: DataFrame, key: Column, shards: Int,
      seed: Long): DataFrame = {
    require(shards > 0 && shards <= 65536, s"shards $shards outside [1, 65536]")
    val h = md5(concat_ws(":", lit(seed.toString), key.cast("string"))
      .cast("binary"))
    // conv() parses the 4 hex chars to 0..65535; long product (int×int
    // would overflow past shards=32768 — an ANSI runtime error), and the
    // double division is exact at these magnitudes (< 2^33) so the floor
    // is a true integer division
    val bucket = conv(substring(h, 1, 4), 16, 10).cast("long")
    val shard = floor(bucket * lit(shards) / lit(65536.0)).cast("int")
    val w = Window.partitionBy(col("shard")).orderBy(col("__graft_h"), key)
    df.filter(key.isNotNull)
      .withColumn("__graft_h", h)
      .withColumn("shard", shard)
      .withColumn("shuffle_rank", row_number().over(w))
      .drop("__graft_h")
  }

  /** Materialize [[shuffleShard]] as the artifact a training job consumes:
    * `outDir/shard=K/` holds ONE parquet file whose row order is the
    * shard's shuffle_rank order, so a loader streaming shard directories
    * 0..n-1 top-to-bottom replays the exact global permutation without
    * sorting anything at read time.
    *
    * One-file-per-shard is forced by hash-partitioning on `shard` before
    * the write (every row of a shard lands in one task; `partitionBy`
    * then splits that task's output by shard value). Hash collisions may
    * give a task two shards — they write sequentially, still one file
    * each. Rows inside a task are pre-sorted by (shard, rank), which the
    * parquet writer preserves. */
  def writeShuffled(df: DataFrame, key: Column, shards: Int, seed: Long,
      outDir: String): Unit =
    shuffleShard(df, key, shards, seed)
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shuffle_rank"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)

  /** Temperature-scaled source mixing — the multilingual/multi-source
    * α-sampling rule (Lample & Conneau 2019, arXiv:1901.07291 §3.1;
    * Xue et al. 2020 mT5, arXiv:2010.11934 §3.2): a total document
    * budget is allocated across sources proportionally to `n_g^α`
    * (α ∈ (0, 1]; α = 1 is proportional sampling, smaller α boosts
    * low-resource sources), then each source contributes its quota in
    * deterministic hash order.
    *
    * Exactness: the raw weight `n_g^α` is quantized ONCE to integer
    * 1e-6 (floor half-up) and the Hamilton / largest-remainder
    * allocation then runs in EXACT DECIMAL(38,0) integer arithmetic
    * (`(B·w) DIV Σw` base quotas, the `B − Σbase` leftover seats going
    * to the largest `(B·w) MOD Σw` remainders, ties by group; 38
    * digits hold `B·w` for any 64-bit group count, where a LONG
    * product would overflow) — no float comparison anywhere downstream
    * of the one quantization, so engines agree bit-for-bit. α = 0.5 stays oracle-exact end to end
    * because IEEE sqrt is correctly rounded on every engine; other α go
    * through `pow`, whose last-ulp rounding is libm-specific — fine
    * within one engine, documented as hash-check-only across engines.
    * A group's quota is capped at its row count (`least(n, quota)`);
    * saturated corpora may therefore undershoot the budget — the
    * single-pass rule every side can replicate, rather than an
    * iterative redistribution.
    *
    * Scale shape: the allocation runs on the GROUP relation (one row
    * per source — partial-aggregated count, two 1-row broadcasts, one
    * G-row window). Row selection is one ranking window whose
    * `rank <= totalBudget` LITERAL bound rewrites to WindowGroupLimit
    * (map tasks ship ≤ budget rows per group, a 10⁹-row source never
    * serializes a sort task), then a broadcast join against the G-row
    * quota relation applies the exact per-group cutoff. Ranking reuses
    * [[capPerGroup]]'s domain-separated `"cap:"` hash so the kept
    * subset stays decorrelated from [[hexBucket]] splits. Null keys
    * and null groups drop, as elsewhere in this module. */
  def temperatureMixture(df: DataFrame, groupCol: String, key: Column,
      totalBudget: Long, alpha: Double = 0.5): DataFrame = {
    require(totalBudget > 0, s"totalBudget $totalBudget must be positive")
    require(alpha > 0 && alpha <= 1, s"alpha $alpha outside (0, 1]")
    // rank-literal pruning and quota sanity; exactness does NOT depend
    // on this bound (the allocation arithmetic below is DECIMAL(38,0))
    require(totalBudget <= 1000000000L,
      s"totalBudget $totalBudget above 1e9 — cap the budget or allocate " +
        "in multiple draws")
    val g = col(groupCol)
    val rows = df.filter(key.isNotNull && g.isNotNull)
    val counts = rows.groupBy(g.as("__g")).agg(count(lit(1)).as("__n"))
    val scaledW = if (alpha == 0.5) sqrt(col("__n").cast("double"))
      else pow(col("__n").cast("double"), lit(alpha))
    // DECIMAL(38,0) end to end: w ≤ ~1e25 for ANY 64-bit group count
    // (n^α·1e6 at α=1, n=2^63), so B·w ≤ 10+25 digits — a 64-bit LONG
    // product would overflow (ANSI throw) already at B=1e9 × a 10k-row
    // group at α=1 (caught in review; regression spec pins that case)
    val weighted = counts.select(col("__g"), col("__n"),
      floor(scaledW * lit(1000000.0) + lit(0.5)).cast("decimal(38,0)")
        .as("__w"))
    val tot = weighted.agg(sum(col("__w")).as("__s"))
    val based = weighted.crossJoin(broadcast(tot))
      .select(col("__g"), col("__n"),
        expr(s"CAST((CAST($totalBudget AS DECIMAL(38,0)) * __w) DIV __s " +
          "AS BIGINT)").as("__base"),
        expr(s"(CAST($totalBudget AS DECIMAL(38,0)) * __w) % __s")
          .as("__rem"))
    val leftover = based.agg((lit(totalBudget) - sum(col("__base"))).as("__l"))
    // global window over the G-row group relation — G is the number of
    // sources, bounded metadata scale, never row scale
    val remRank = Window.orderBy(col("__rem").desc, col("__g"))
    val quotas = based.crossJoin(broadcast(leftover))
      .withColumn("__rr", row_number().over(remRank))
      .select(col("__g"),
        least(col("__n"), col("__base") +
          when(col("__rr") <= col("__l"), lit(1L)).otherwise(lit(0L)))
          .as("__k"))
    val ord = md5(concat(lit("cap:"), key.cast("string")).cast("binary"))
    val w = Window.partitionBy(g).orderBy(ord, key)
    rows.withColumn("__graft_rk", row_number().over(w))
      .filter(col("__graft_rk") <= lit(totalBudget))
      .join(broadcast(quotas), g === col("__g"))
      .filter(col("__graft_rk") <= col("__k"))
      .drop("__graft_rk", "__g", "__k")
  }

  /** Seeded weighted sampling WITHOUT replacement via the Gumbel top-k
    * trick (Vieira 2014; equivalent to Efraimidis & Spirakis 2006
    * reservoir keys): taking the k largest `logw_i + G_i` with
    * `G_i = -ln(-ln(U_i))` i.i.d. Gumbel draws samples k items without
    * replacement with probability proportional to `exp(logw_i)` — the
    * resampling step DSIR (arXiv:2302.03169 §3) runs over its importance
    * weights, here composable with [[Dsir.score]]'s `score_e4` output.
    *
    * Everything is deterministic and engine-portable: `U_i` derives from
    * the row key, not an RNG stream — the first 13 md5 hex digits of
    * `"gum:<seed>:<key>"` as an exact 52-bit dyadic rational
    * `(h + 0.5) / 2^52` (never 0 or 1, so both `ln`s are finite), the
    * same per-row-hash discipline as [[hashSplit]] (stable across runs,
    * engines, partitionings — `rand()`'s per-partition streams are
    * none of these). The sampling key `logw + G` is quantized ONCE to
    * integer 1e-4 (half-up floor, the L43 float discipline) and ties
    * break on the key column, so the selected set is total-ordered and
    * reproducible; `logw` arrives as the 1e-4-nat integer convention
    * (`weightE4Col`), divided out in DOUBLE exactly as the oracle does.
    *
    * Scale shape: one narrow projection computes keys, then TakeOrdered
    * (per-partition heaps + a k-row driver merge) — no global sort, no
    * shuffle of the corpus. */
  def gumbelTopK(df: DataFrame, keyCol: String, weightE4Col: String,
      k: Int, seed: String): DataFrame = {
    require(k > 0, s"k $k must be positive")
    df.select(col("*"), gumbelKeyE4(keyCol, weightE4Col, seed))
      .orderBy(col("gumbel_key_e4").desc, col(keyCol))
      .limit(k)
  }

  /** The shared Gumbel sampling key (see [[gumbelTopK]]'s contract). */
  private def gumbelKeyE4(keyCol: String, weightE4Col: String,
      seed: String): Column = {
    // 2^52 as an exact literal — pow() is a float call some engines
    // round differently; the constant is exact in both.
    val twoPow52 = lit(4503599627370496.0)
    val u = (conv(substring(md5(concat(lit(s"gum:$seed:"),
        col(keyCol).cast("string")).cast("binary")), 1, 13), 16, 10)
      .cast("double") + lit(0.5)) / twoPow52
    floor((col(weightE4Col).cast("double") / lit(10000.0) -
      log(-log(u))) * lit(10000.0) + lit(0.5)).as("gumbel_key_e4")
  }

  /** [[gumbelTopK]] PER GROUP — weighted sampling without replacement of
    * k rows from every group in one pass (k quality-weighted docs per
    * source, k exemplars per cluster). Same deterministic per-row-hash
    * Gumbel key; selection is `row_number ≤ k` over (group, key desc) —
    * Spark's WindowGroupLimit keeps each map task's local top-k per
    * group BEFORE the shuffle (the L34 caps discipline), so a billion-row
    * group ships ~k·tasks rows, and there is NO TakeOrdered driver
    * bottleneck multiplied across 10⁵ groups. Adds `gumbel_key_e4` and
    * `rank` (1..k by key desc, tie-broken on the key column). Null
    * group keys form a group of their own (grouping semantics). */
  def gumbelTopKPerGroup(df: DataFrame, groupCol: String, keyCol: String,
      weightE4Col: String, k: Int, seed: String): DataFrame = {
    require(k > 0, s"k $k must be positive")
    df.select(col("*"), gumbelKeyE4(keyCol, weightE4Col, seed))
      .withColumn("rank", row_number().over(Window.partitionBy(col(groupCol))
        .orderBy(col("gumbel_key_e4").desc, col(keyCol))))
      .filter(col("rank") <= k)
  }
}
