package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed top-principal-component extraction over an embedding
  * column — the whitening/outlier axis of embedding curation (the
  * direction SemDeDup-style pipelines remove or normalize before
  * cosine comparisons; Golub & Van Loan, Matrix Computations §7.3 —
  * the power method). Everything is the repo's exact-integer idiom so
  * a fixed `rounds` yields the identical component on any engine:
  *
  *  1. vectors quantize ONCE to integer 1e-4 parts (coarser than the
  *     ANN family's 1e-6 BY DESIGN — the capacity law below);
  *  2. one corpus pass accumulates the second-moment grid M[i][j] =
  *     Σ xᵢxⱼ, the dim sums S and the count n — a per-partition
  *     outer-product KERNEL (the dHash/CDC typed-kernel discipline: a
  *     per-row dim² HOF expansion would evaluate interpreted) emitting
  *     ≤ dim²+dim+1 rows per partition, ONE grid-sized aggregation;
  *  3. the centered scatter n·M − S·Sᵀ is exact BIGINT on the driver
  *     (grid-sized, the codebook-collect class), rescaled once to
  *     integer 1e6 of its max |cell|;
  *  4. `rounds` power iterations on the 64×64 grid, renormalizing to
  *     1e6 of max |wᵢ| each round with ONE half-up floor — driver
  *     arithmetic, zero Spark jobs per round;
  *  5. the unit-free PC re-enters as a literal; per-doc projection is
  *     one narrow codegen-safe dot (once per ROW, never per candidate
  *     — the q_v8 HOF rule).
  *
  * Capacity law (why 1e-4): the scatter entry bound is
  * n²·(scale²·dim_range²) — at scale 1e4 the exact-BIGINT path holds to
  * n ≈ 10⁶ docs per fit; beyond that the fit runs per-shard (PCA over a
  * uniform sample is statistically standard) or the moments move to
  * DECIMAL(38,0)/HUGEINT with the same shapes. All floats that cross
  * engines are double ops in pinned order inside half-up floors (the
  * L43 discipline); degenerate inputs (all-identical vectors → zero
  * scatter; a zero iterate) keep well-defined fixpoints via the
  * max=0 guards. Sign is fixed by the all-ones start vector. */
object Pca {

  final case class Model(dim: Int, n: Long, pcE6: Array[Long])

  /** (id, q) at integer 1e-4 parts; null ids/vectors dropped. */
  def quantizeE4(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        transform(col(vecCol),
          x => floor(x.cast("double") * 10000 + lit(0.5)).cast("long"))
          .as("q"))

  /** Fit PC1 by `rounds` power iterations (pure function of the data —
    * the oracle unrolls the identical recurrence). */
  def fitPc1(df: DataFrame, idCol: String, vecCol: String,
      rounds: Int = 8): Model = {
    require(rounds >= 1 && rounds <= 50,
      s"rounds $rounds outside [1, 50]")
    val spark = df.sparkSession
    import spark.implicits._
    val q = quantizeE4(df, idCol, vecCol).localCheckpoint(false)
    try {
      val dims = q.select(size(col("q")).as("d")).distinct()
        .as[Int].collect()
      require(dims.length == 1,
        s"ragged vector dimensions: ${dims.sorted.mkString(", ")}")
      val dim = dims.head
      require(dim >= 1 && dim <= 512, s"dim $dim outside [1, 512]")

      // flat index: [0, dim²) = M cells, [dim², dim²+dim) = S, last = n
      val nIdx = dim * dim + dim
      val grid = q.select(col("q")).as[Seq[Long]]
        .mapPartitions { it =>
          var n = 0L
          val acc = new Array[Long](nIdx + 1)
          it.foreach { qv =>
            n += 1
            var i = 0
            while (i < dim) {
              val xi = qv(i)
              acc(dim * dim + i) += xi
              var j = 0
              while (j < dim) { acc(i * dim + j) += xi * qv(j); j += 1 }
              i += 1
            }
          }
          if (n == 0L) Iterator.empty
          else {
            acc(nIdx) = n
            acc.iterator.zipWithIndex.map { case (v, k) => (k, v) }
          }
        }
        .toDF("k", "v")
        .groupBy(col("k")).agg(sum(col("v")).as("v"))
        .as[(Int, Long)].collect() // bounded: dim² + dim + 1 rows
        .toMap
      val n = grid.getOrElse(nIdx, 0L)
      require(n > 0, "PCA fit over an empty corpus")
      val s = Array.tabulate(dim)(i => grid(dim * dim + i))
      val mFlat = Array.tabulate(dim * dim)(grid)

      // exact centered scatter + one rescale to integer 1e6
      val scatter = Array.tabulate(dim, dim)((i, j) =>
        n * mFlat(i * dim + j) - s(i) * s(j))
      val mx = scatter.flatten.map(math.abs).max
      val a = scatter.map(_.map(c =>
        if (mx == 0L) 0L
        else math.floor(c.toDouble * 1000000.0 / mx + 0.5).toLong))

      var v = Array.fill(dim)(1000000L)
      for (_ <- 1 to rounds) {
        val w = Array.tabulate(dim)(i =>
          (0 until dim).map(j => a(i)(j) * v(j)).sum)
        val mw = w.map(math.abs).max
        v = w.map(x =>
          if (mw == 0L) x
          else math.floor(x.toDouble * 1000000.0 / mw + 0.5).toLong)
      }
      Model(dim, n, v)
    } finally Checkpoints.release(q)
  }

  /** (vec_id, proj) — each doc's exact integer projection onto PC1
    * (1e-10 parts: 1e-4 components × 1e-6 loadings). */
  def projectPc1(df: DataFrame, idCol: String, vecCol: String,
      rounds: Int = 8): DataFrame = {
    val model = fitPc1(df, idCol, vecCol, rounds)
    val pcLit = typedlit(model.pcE6.toSeq)
    quantizeE4(df, idCol, vecCol)
      .select(col("id").as("vec_id"),
        aggregate(zip_with(col("q"), pcLit, (x, p) => x * p),
          lit(0L), (acc, t) => acc + t).as("proj"))
  }

  /** The generated DuckDB replay: quantize → moment grid → exact
    * scatter → 1e6 rescale → `rounds` unrolled power iterations →
    * per-doc projection. Yields CTE `proj(vec_id, proj)`; embed as
    * `WITH ${Pca.oracleCtes(rounds)} SELECT ... FROM proj`. SUMs that
    * DuckDB widens to HUGEINT are CAST back at each use. */
  private[graft] def oracleCtes(rounds: Int): String = {
    // every CTE is MATERIALIZED: the iteration chain references its
    // predecessor twice (w via v, max via w), and DuckDB's default
    // inlining would re-expand the whole upstream per reference —
    // 2^rounds copies of the moment join (measured: >10 min at the
    // SMALLEST gate scale; materialized: sub-second)
    val iters = (1 to rounds).map { r =>
      val pv = if (r == 1) "v0" else s"v${r - 1}"
      s"""w$r AS MATERIALIZED (SELECT a0.i AS d,
              CAST(SUM(a0.a * v.v) AS BIGINT) AS w
            FROM a0 JOIN $pv v ON v.d = a0.j GROUP BY a0.i),
          mw$r AS MATERIALIZED (SELECT MAX(ABS(w)) AS mw FROM w$r),
          v$r AS MATERIALIZED (SELECT d, CASE WHEN mw = 0 THEN w
              ELSE CAST(FLOOR(CAST(w AS DOUBLE) * 1000000.0 / mw + 0.5)
                AS BIGINT) END AS v
            FROM w$r CROSS JOIN mw$r)"""
    }.mkString(",\n")
    s"""e AS MATERIALIZED (SELECT vec_id AS id,
            struct_extract(u, 'd') AS d,
            struct_extract(u, 'x') AS x
          FROM (SELECT vec_id,
                  unnest(list_transform(range(1, len(embedding) + 1),
                    i -> {'d': i, 'x': CAST(FLOOR(CAST(embedding[i] AS DOUBLE)
                      * 10000.0 + 0.5) AS BIGINT)})) AS u
                FROM embeddings
                WHERE vec_id IS NOT NULL AND embedding IS NOT NULL)),
        st AS MATERIALIZED (SELECT d, CAST(SUM(x) AS BIGINT) AS s
               FROM e GROUP BY d),
        nn AS MATERIALIZED (SELECT COUNT(DISTINCT id) AS n FROM e),
        mo AS MATERIALIZED (SELECT a.d AS i, b.d AS j,
                 CAST(SUM(a.x * b.x) AS BIGINT) AS m
               FROM e a JOIN e b USING (id) GROUP BY a.d, b.d),
        sc AS MATERIALIZED (SELECT mo.i, mo.j, nn.n * mo.m - si.s * sj.s AS c
               FROM mo JOIN st si ON si.d = mo.i
                 JOIN st sj ON sj.d = mo.j CROSS JOIN nn),
        mx AS MATERIALIZED (SELECT MAX(ABS(c)) AS mx FROM sc),
        a0 AS MATERIALIZED (SELECT i, j, CASE WHEN mx = 0 THEN 0
              ELSE CAST(FLOOR(CAST(c AS DOUBLE) * 1000000.0 / mx + 0.5)
                AS BIGINT) END AS a
            FROM sc CROSS JOIN mx),
        v0 AS MATERIALIZED (SELECT DISTINCT d, CAST(1000000 AS BIGINT) AS v
            FROM e),
        $iters,
        proj AS (SELECT e.id AS vec_id,
              CAST(SUM(e.x * p.v) AS BIGINT) AS proj
            FROM e JOIN v$rounds p ON p.d = e.d GROUP BY e.id)"""
  }
}
