package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) — the insertion-resilient dedup
  * granularity between L1's whole-document hash and L76's
  * corpus-global exact-substring pass: chunk boundaries are cut where
  * a rolling window hash hits a divisor class, so inserting a prefix
  * into a document shifts only the chunks up to the first
  * re-synchronized boundary and every later chunk hashes identically
  * (the LBFS/FastCDC principle behind incremental-crawl dedup — an
  * edited re-crawl of a page shares almost all its chunks with the
  * original, which fixed-width shingles at the same granularity miss).
  *
  * Determinism contract (engine ≡ oracle ≡ spec reference): window
  * hash is a W=8 Horner polynomial mod M = 1e9+7 evaluated afresh per
  * position (no rolling subtract — the mod algebra is identical but
  * the replay is term-for-term the oracle's expression); a cut falls
  * after the window's last character when hash % D == 0 (D = 64 →
  * expected chunk ≈ 64 chars); the document tail is always a final
  * chunk. No min/max-length valves: they would make the cut set a
  * SEQUENTIAL scan state (each cut depends on the previous), which no
  * single SQL window replays — the divisor rule keeps every cut a
  * pure function of its 8-char window. Documents shorter than W are
  * one chunk; empty/null text yields no rows.
  *
  * Scale shape: chunking is a per-row typed kernel (the dHashKernel
  * discipline — a column-expression form would re-inline the window
  * hash per reference under interpreted HOF evaluation), O(len·W)
  * branch-free integer ops, NO shuffle; only (id, chunk_idx, 16-byte
  * md5, len) rows leave the scan — chunk TEXT never shuffles. The
  * dedup itself is then one map-side-combinable groupBy on the digest
  * (the q_m5 blob-dedup shape at chunk granularity). ASCII contract:
  * positions are Scala char = UTF-16 units vs DuckDB code points —
  * identical on the battery's ASCII corpus (the dHash/luminance
  * precedent, documented there). */
object CdcChunk {

  val W = 8
  val B = 257L
  val M = 1000000007L
  val D = 64L

  /** (id, chunk_idx, chunk_md5, chunk_len) — chunk_idx is 1-based in
    * document order; md5 is over the chunk's UTF-8 bytes (hex,
    * lowercase — both engines' md5 of the same ASCII substring). */
  def chunks(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .as[(Long, String)]
      .mapPartitions { it =>
        // one digest per partition — MessageDigest.digest() resets
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          cutPositions(text) match {
            case Nil => Iterator.empty
            case cuts =>
              var start = 0
              cuts.iterator.zipWithIndex.map { case (cut, idx) =>
                val chunk = text.substring(start, cut)
                val digest = md.digest(
                  chunk.getBytes(java.nio.charset.StandardCharsets.UTF_8))
                val hex = digest.map("%02x".format(_)).mkString
                val row = (id, (idx + 1).toLong, hex, chunk.length.toLong)
                start = cut
                row
              }
          }
        }
      }.toDF("id", "chunk_idx", "chunk_md5", "chunk_len")
  }

  /** Exclusive cut positions (0-based substring ends) including the
    * final document length; empty text → Nil. Mirrors the oracle's
    * 1-based cutpos = window start + W − 1 exactly. */
  private[graft] def cutPositions(text: String): List[Int] = {
    val n = text.length
    if (n == 0) return Nil
    val buf = scala.collection.mutable.ListBuffer.empty[Int]
    var j = 0
    while (j + W <= n) {
      var h = 0L
      var k = 0
      while (k < W) { h = (h * B + text.charAt(j + k).toLong) % M; k += 1 }
      if (h % D == 0L) buf += j + W
      j += 1
    }
    if (buf.isEmpty || buf.last != n) buf += n
    buf.toList
  }

  /** The oracle's chunk table: CTEs from a caller-supplied `docs(id,
    * text)` down to `chunks(id, chunk_idx, chunk_md5, chunk_len)` —
    * the Horner window hash unrolled term-for-term from the same
    * (W, B, M, D), the KCore generator discipline. */
  private[graft] def oracleCtes: String = {
    // Horner with a mod per step: values stay < M·B + 127 ≈ 2.6e11 —
    // DuckDB multiplies INT32 literals with overflow checks (the
    // q_x15 lesson), so B is spelled CAST to BIGINT once
    val horner = (1 to W).foldLeft("CAST(0 AS BIGINT)") { (acc, k) =>
      s"(($acc * $B + unicode(substr(text, i + ${k - 1}, 1))) % $M)"
    }
    // unnest(range(...)) not generate_series: DuckDB's table-function
    // form rejects lateral column arguments (the q_d10 oracle's form)
    s"""pos AS (SELECT id, text, i
            FROM docs, unnest(range(1, len(text) - ${W - 2})) AS t(i)),
        cuts AS (SELECT id, i + ${W - 1} AS cutpos
            FROM pos WHERE ($horner) % $D = 0),
        allcuts AS (SELECT id, cutpos FROM cuts
            UNION SELECT id, len(text) AS cutpos FROM docs
            WHERE len(text) > 0),
        bounds AS (SELECT id, cutpos,
            COALESCE(LAG(cutpos) OVER (PARTITION BY id ORDER BY cutpos),
              0) + 1 AS s,
            ROW_NUMBER() OVER (PARTITION BY id ORDER BY cutpos)
              AS chunk_idx
            FROM allcuts),
        chunks AS (SELECT b.id, b.chunk_idx,
            md5(substr(d.text, b.s, b.cutpos - b.s + 1)) AS chunk_md5,
            CAST(b.cutpos - b.s + 1 AS BIGINT) AS chunk_len
            FROM bounds b JOIN docs d ON b.id = d.id)"""
  }
}
