package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable quantile sketch — the KMV companion for quantiles
  * (VERDICT r12 #4). Bottom-k rows by md5(value‖id) form a uniform
  * random sample of the group (each row's hash is an i.i.d. uniform
  * draw; the k smallest are a simple random sample without
  * replacement — Vitter's reservoir semantics made deterministic and
  * mergeable by the hash order), the sketch IS a table column (a
  * ≤k-element array of (h, v) structs sorted by h), and union =
  * k-smallest of the concatenation by the SAME hash order — an exact,
  * deterministic, order-free operation the oracle replays bit-for-bit
  * (the [[Kmv.merge]] shape). merge(sketch(A), sketch(B)) ≡
  * sketch(A ∪ B) for disjoint A, B is an algebraic identity: the k
  * hash-smallest rows of a union are among the k hash-smallest of each
  * side. Quantile estimates are rank-selects on the sample's sorted
  * values, in EXACTLY [[MedianImpute.groupedQuantiles]]'s lower-
  * quantile convention (0-based rank `p·(n−1) div 1e6`), so sketch vs
  * exact is an apples-to-apples comparison — with k ≥ group size the
  * estimate IS the exact quantile (spec-pinned).
  *
  * Why per-ROW hashing where [[Kmv]] hashes per-VALUE: a distinct-count
  * sketch wants duplicates collapsed; a quantile sketch must weight a
  * value by its multiplicity, so every row needs its own uniform draw —
  * hence md5(value‖id) with a row-unique id. Two rows never share a
  * draw (id is unique); md5 collisions are the battery's usual
  * no-collision class and would merely reorder one sample slot.
  *
  * Determinism/exactness: the 56-bit md5 hash is the house idiom both
  * engines compute identically ([[Kmv.keyHash]]'s form over the
  * `value|id` rendering of two BIGINTs). The estimate carries the
  * sample's ~1/√k rank error (DKW); the error is DETERMINISTIC given
  * the corpus — the spec measures it against the exact machinery.
  *
  * Scale shape: one row_number ≤ k per group — Spark's
  * InferWindowGroupLimit inserts a PARTIAL WindowGroupLimit before the
  * group exchange, so each map task ships at most k rows per group and
  * no hot group serializes its full row set into one task (the
  * [[Kmv.sketch]] lesson, plan-pinned). Merge unions GRID×k-sized
  * tables; nothing corpus-sized moves. */
object QuantileSketch {

  /** Ceiling on the sample size: sketch arrays are grid-sized table
    * cells (groups × k), not corpus-sized. 4096 gives ~1.6% DKW rank
    * error — beyond that, shard the group key. */
  val MaxK = 4096

  /** 56-bit per-row hash: md5 over the `value|id` rendering of the two
    * BIGINTs (shared verbatim with the oracle: `CAST(concat('0x',
    * substr(md5(CAST(v AS VARCHAR) || '|' || CAST(id AS VARCHAR)), 1,
    * 14)) AS BIGINT)`). */
  def rowHash(value: Column, id: Column): Column =
    conv(substring(md5(concat(value.cast("string"), lit("|"),
      id.cast("string")).cast("binary")), 1, 14), 16, 10).cast("long")

  /** JVM mirror of [[rowHash]] — byte-identical by construction (same
    * `value|id` rendering, same first-14-hex-chars window), shared with
    * [[graft.streaming.StreamingQuantileSketch]] so the batch
    * expression and the streaming state update cannot drift (the
    * dHashBits discipline); equivalence is spec-pinned. */
  private[graft] def rowHashJvm(value: Long, id: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$value|$id".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(14)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Per-group sketch: (groupCols…, qs) where qs is the array of the
    * ≤k hash-smallest (h, v) rows, sorted by h. Values cast to long
    * (the house integer discipline — quantize upstream); null values
    * and null ids are dropped; groups with no surviving rows emit no
    * row. */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      idCol: String, k: Int): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    require(k >= 1 && k <= MaxK, s"k $k outside [1, $MaxK]")
    Reserved.guard(groupCols, Seq("qs", "__h", "__v", "__rn"),
      "QuantileSketch")
    val hashed = df
      .filter(col(valueCol).isNotNull && col(idCol).isNotNull)
      .select(groupCols.map(col) ++ Seq(
        col(valueCol).cast("long").as("__v"),
        rowHash(col(valueCol).cast("long"), col(idCol)).as("__h")): _*)
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__h"))
    hashed
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(groupCols.map(col): _*)
      .agg(array_sort(collect_list(
        struct(col("__h").as("h"), col("__v").as("v")))).as("qs"))
  }

  /** Union of two sketch tables in [[sketch]]'s schema: per group the
    * k hash-smallest of the concatenated samples — exact SQL over
    * grid-sized inputs. `array_distinct` makes re-merging the same
    * delta idempotent (identical (h, v) structs collapse); groups on
    * one side only pass through, so merging an empty delta is the
    * identity (the IncrementalAgg contract). Struct sort order is
    * lexicographic by field, i.e. by h — the same hash order the
    * direct sketch uses. */
  def merge(base: DataFrame, delta: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame = {
    require(k >= 1 && k <= MaxK, s"k $k outside [1, $MaxK]")
    base.unionByName(delta)
      .groupBy(groupCols.map(col): _*)
      .agg(slice(array_sort(array_distinct(
        flatten(collect_list(col("qs"))))), 1, k).as("qs"))
  }

  /** Quantile estimates over a sketch table: one row per (group, p_e6)
    * with n_sample and v_est = the sample's lower quantile — sorted
    * sample values, 0-based rank `p_e6·(n−1) div 1e6`, the
    * [[MedianImpute.groupedQuantiles]] convention verbatim. The sorted
    * value array is computed ONCE per group row, before the p-explode
    * (the interpreted-HOF-per-exploded-row lesson). */
  def estimateQuantiles(sketchTable: DataFrame,
      psE6: Seq[Long]): DataFrame = {
    require(psE6.nonEmpty, "at least one quantile")
    psE6.foreach(p =>
      require(p >= 0L && p <= 1000000L, s"p_e6 $p outside [0, 1e6]"))
    sketchTable
      .withColumn("__vs",
        array_sort(transform(col("qs"), s => s.getField("v"))))
      .withColumn("n_sample", size(col("qs")).cast("long"))
      .filter(col("n_sample") > 0L)
      .withColumn("p_e6", explode(array(psE6.distinct.sorted.map(lit): _*)))
      .withColumn("v_est", element_at(col("__vs"),
        (call_function("div", col("p_e6") * (col("n_sample") - lit(1L)),
          lit(1000000L)) + lit(1L)).cast("int")))
      .drop("__vs", "qs")
  }
}
