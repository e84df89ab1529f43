package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-type transition matrix — the first-order Markov view of an
  * event stream (product-analytics "users who did X next did Y", the
  * sequence complement to L57's ordered funnel and L58's cohort
  * retention: the funnel asks "did the fixed sequence happen", the
  * matrix asks "what sequences happen"). Per entity, events order by
  * (event time, id) — the battery's total-order convention — and every
  * adjacent pair contributes one (from_type, to_type) observation;
  * output carries the count, the from-row total, and the row-normalized
  * transition probability as an exact ppm floor (n·10⁶ div row_n — no
  * float anywhere).
  *
  * Scale shape: ONE window pass (lead over the per-entity order) and
  * two grid-sized aggregations (|types|² matrix, |types| row totals).
  * The per-entity window serializes a hot entity's history into one
  * task — the documented L20 pathology; at 100 TB reuse the Sessions
  * chunkWidth treatment (local transitions per (entity, time-chunk),
  * boundary pairs stitched from the chunk-edge rows — same stitch
  * algebra, one extra grid join). The battery corpus has no hot
  * entities, so the plain window is the honest measured form here.
  * Null entities, types, ids or times drop (a transition needs a total
  * order and two named endpoints). */
object Transitions {

  /** (from_type, to_type, n, row_n, p_ppm), one row per observed
    * transition. `usCol` is the event-time column in epoch micros
    * (callers pass `Tables.epochMicros` output — the physical-type
    * adapting helper). */
  def matrix(events: DataFrame, entityCol: String, usCol: Column,
      idCol: String, typeCol: String): DataFrame = {
    val base = events
      .withColumn("__us", usCol)
      .filter(col(entityCol).isNotNull && col(typeCol).isNotNull &&
        col(idCol).isNotNull && col("__us").isNotNull)
      .select(col(entityCol).as("__e"), col("__us"),
        col(idCol).as("__id"), col(typeCol).as("from_type"))
    val w = Window.partitionBy(col("__e"))
      .orderBy(col("__us"), col("__id"))
    val counts = base
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_type"))
      .agg(sum(col("n")).as("row_n"))
    counts
      .join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"), col("row_n"),
        call_function("div", col("n") * lit(1000000L), col("row_n"))
          .as("p_ppm"))
  }

  /** The hot-entity-safe form of [[matrix]] (the Sessions `chunkWidth`
    * treatment, implemented rather than just documented): adjacency is
    * computed per (entity, time-chunk) — a hot entity's history SPANS
    * partitions instead of serializing into one window task — and the
    * one pair each chunk boundary owns is stitched from a per-chunk
    * summary table carrying only each chunk's FIRST and LAST event
    * (2 rows per non-empty chunk; the lead window that orders chunk
    * summaries serializes summaries, never events).
    *
    * Equivalence to [[matrix]] is exact, not approximate: chunk id =
    * us div width is monotone in the (us, id) order (equal timestamps
    * land in the SAME chunk, so no tie can straddle a boundary), hence
    * global adjacency = within-chunk adjacency ∪ (last of chunk k →
    * first of next non-empty chunk) — spec-pinned property-equal on
    * seeded data including a 90%-hot entity. */
  def matrixChunked(events: DataFrame, entityCol: String, usCol: Column,
      idCol: String, typeCol: String, chunkWidthUs: Long): DataFrame = {
    require(chunkWidthUs > 0L, s"chunkWidthUs $chunkWidthUs must be > 0")
    val base = events
      .withColumn("__us", usCol)
      .filter(col(entityCol).isNotNull && col(typeCol).isNotNull &&
        col(idCol).isNotNull && col("__us").isNotNull)
      .select(col(entityCol).as("__e"), col("__us"),
        col(idCol).as("__id"), col(typeCol).as("__ty"),
        call_function("div", col("__us"), lit(chunkWidthUs)).as("__ck"))
    val wCk = Window.partitionBy(col("__e"), col("__ck"))
      .orderBy(col("__us"), col("__id"))
    val inChunk = base
      .withColumn("__next", lead(col("__ty"), 1).over(wCk))
      .filter(col("__next").isNotNull)
      .select(col("__ty").as("from_type"), col("__next").as("to_type"))
    // per-chunk summary: first/last event types under the total order —
    // ONE row per (entity, chunk), struct-extremes (map-side
    // combinable), never a window over the entity's full history
    val summary = base
      .groupBy(col("__e"), col("__ck"))
      .agg(
        min(struct(col("__us"), col("__id"), col("__ty"))).as("__first"),
        max(struct(col("__us"), col("__id"), col("__ty"))).as("__last"))
    val wSum = Window.partitionBy(col("__e")).orderBy(col("__ck"))
    val boundary = summary
      .withColumn("__nf", lead(col("__first.__ty"), 1).over(wSum))
      .filter(col("__nf").isNotNull)
      .select(col("__last.__ty").as("from_type"),
        col("__nf").as("to_type"))
    val counts = inChunk.unionAll(boundary)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_type"))
      .agg(sum(col("n")).as("row_n"))
    counts
      .join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"), col("row_n"),
        call_function("div", col("n") * lit(1000000L), col("row_n"))
          .as("p_ppm"))
  }

  /** Max (from, to) matrix cells collected to the driver. */
  val MaxCells = 100000

  /** Stationary distribution of a [[matrix]] by power iteration (r12,
    * L134 — "where does the event stream settle"): π ← normalize(π·P),
    * `rounds` synchronous steps from uniform. Quantize-once +
    * exact-rational (the Doremi discipline): P enters as the matrix's
    * ALREADY-quantized integer `p_ppm` cells — no new float — and each
    * step is raw_j = Σ_i π_i·p_ppm_ij (≤ 10¹² per term, exact BIGINT)
    * followed by Hamilton renormalization to Σ = 10⁶ (the shared
    * [[Doremi.hamilton]] algebra — renormalization also reabsorbs the
    * mass the ppm floors and any dangling rows shed, the
    * PageRank-without-teleport convention, documented). States that
    * never appear as a from_type keep rank as targets but emit no
    * outgoing mass. Iterations are BigInt driver arithmetic on the
    * ≤ [[MaxCells]] grid (the BradleyTerry class — LocalTableScan
    * result); a synchronous fixed round count gives identical integers
    * on any engine, and the oracle unrolls the same rounds in HUGEINT.
    * Output: (event_type, pi_e6), Σ pi_e6 = 10⁶ exactly. */
  def stationary(matrixDf: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 100, s"rounds $rounds outside [1, 100]")
    val spark = matrixDf.sparkSession
    import spark.implicits._
    val cells = BoundedGrid.collectBounded(
      matrixDf.select(col("from_type").cast("string"),
        col("to_type").cast("string"), col("p_ppm").cast("long")),
      MaxCells, "transition matrix",
      "a transition matrix is type-grid-sized; reduce the type " +
        "vocabulary first")
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    if (cells.isEmpty) {
      return Seq.empty[(String, Long)].toDF("event_type", "pi_e6")
    }
    val types = cells.flatMap(c => Seq(c._1, c._2)).distinct.sorted
    val idx = types.zipWithIndex.toMap
    val byFrom = cells.groupBy(c => idx(c._1))
      .map { case (i, cs) => i -> cs.map(c => (idx(c._2), c._3)) }
    val M = BigInt(1000000)
    var pi = Doremi.hamilton(Seq.fill(types.length)(BigInt(1)), M)
    for (_ <- 1 to rounds) {
      val raw = Array.fill(types.length)(BigInt(0))
      for ((i, outs) <- byFrom; (j, ppm) <- outs)
        raw(j) += pi(i) * BigInt(ppm)
      pi = Doremi.hamilton(raw.toSeq, M)
    }
    types.indices.map(i => (types(i), pi(i).toLong))
      .toDF("event_type", "pi_e6")
  }

  /** GENERATED DuckDB replay of [[stationary]] over a matrix CTE named
    * `m(from_type, to_type, p_ppm)` — unrolled rounds, the shared
    * Hamilton form in HUGEINT (the Doremi oracle discipline). */
  def stationaryOracleSql(matrixCtes: String, rounds: Int): String = {
    // one Hamilton round: previous pi CTE (ty, pi) × m → raw per target,
    // then base/remainder/leftover normalization back to the 1e6 grid
    def round(prev: String, name: String): String =
      s"""$name AS (
           SELECT ty, CAST(base + CASE WHEN ROW_NUMBER()
               OVER (ORDER BY rem DESC, ty) <= lo THEN 1 ELSE 0 END
             AS BIGINT) AS pi
           FROM (
             SELECT *, 1000000 - SUM(base) OVER () AS lo
             FROM (
               SELECT *, CAST(raw * 1000000 // s AS BIGINT) AS base,
                      (raw * 1000000) % s AS rem
               FROM (
                 SELECT t.ty,
                        COALESCE(SUM(CAST(p.pi AS HUGEINT) * m.p_ppm), 0)
                          AS raw,
                        SUM(SUM(CAST(p.pi AS HUGEINT) * m.p_ppm))
                          OVER () AS s
                 FROM types t
                 LEFT JOIN m ON m.to_type = t.ty
                 LEFT JOIN $prev p ON p.ty = m.from_type
                 GROUP BY t.ty) rw) bs) lf)"""
    val roundCtes = (1 to rounds).map(r =>
      round(if (r == 1) "p0" else s"p${r - 1}", s"p$r")).mkString(",\n")
    s"""$matrixCtes,
        types AS (SELECT from_type AS ty FROM m
                  UNION SELECT to_type FROM m),
        tk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                      CAST(1000000 AS BIGINT) AS tot FROM types),
        p0 AS (SELECT ty,
                 CAST(tk.tot // tk.k + CASE WHEN ROW_NUMBER()
                   OVER (ORDER BY ty) <= tk.tot % tk.k
                   THEN 1 ELSE 0 END AS BIGINT) AS pi
               FROM types, tk),
        $roundCtes
       SELECT ty AS event_type, pi AS pi_e6 FROM p$rounds
       ORDER BY event_type"""
  }
}
