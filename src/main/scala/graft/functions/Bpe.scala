package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding token counting with a real (fixed) merge table —
  * the upgrade of [[TextAnalysis.bpeishTokenCount]] from "piece-count
  * heuristic" to the actual BPE algorithm (Sennrich et al. 2016,
  * arXiv:1508.07909): start from characters, repeatedly merge the
  * highest-priority adjacent symbol pair, count the surviving symbols.
  * Token budgets for sequence packing / chunking become realistic once
  * the counter honors a learned merge order instead of guessing from
  * character classes.
  *
  * Merge application is per whitespace word (the standard pre-tokenized
  * form, no end-of-word marker in this variant), left-to-right and
  * non-overlapping per pair, pairs in rank order. The table must be
  * WELL-FORMED — each side of a merge is a single character or the
  * output of an EARLIER merge, which every table learned by the BPE
  * training loop satisfies by construction. Well-formedness is what
  * makes one global pass per pair exact: a pair that has been fully
  * merged can never re-form from later merges' outputs (later outputs
  * did not exist when the earlier pair was learned, and fusing symbols
  * between two symbols never makes them adjacent), so rank-order passes
  * ≡ the textbook lowest-rank-first loop. The DuckDB oracle exploits
  * exactly this: the q_t13 SQL applies the same merges as a chain of
  * boundary-safe string REPLACEs over "(c) (c) …"-wrapped words
  * (generated from THIS table — single source of truth) and must land
  * on identical counts.
  *
  * Scale shape: a JIT'd typed mapPartitions — per-row work is
  * O(words × merges × word length) with zero shuffle; the merge table
  * rides the closure (a real vocabulary's ~50k merges is ~1 MB — still
  * closure/broadcast territory, never a join). */
object Bpe {

  /** A small fixed English merge table (rank order). Hand-chosen common
    * pairs, each side a single char or an earlier output — validated by
    * [[wellFormed]] at use. */
  val DefaultMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "an" -> "d",
    "e" -> "r", "o" -> "u", "r" -> "e", "o" -> "n", "e" -> "n",
    "a" -> "t", "o" -> "r", "e" -> "s", "s" -> "t", "i" -> "s",
    "a" -> "l", "e" -> "d", "in" -> "g", "t" -> "o", "i" -> "t",
    "c" -> "h", "s" -> "h", "w" -> "h", "th" -> "at", "o" -> "f")

  /** A 1000-merge table learned offline (scripts/learn_bpe.py, the
    * standard BPE training loop) from the checked-in original-prose
    * corpus scripts/bpe_train_corpus.txt, stored as a TSV resource —
    * vocabulary-realistic merge ranks ("th", "in", "the", …) for
    * realistic token budgets. Sides are [a-z]+ by construction (so the
    * oracle's quoted REPLACE literals never need escaping) and the table
    * is well-formed by the training loop's construction — still
    * validated at use. ~9 KB in the closure; a full 50k-merge vocabulary
    * is ~1 MB — closure/broadcast territory, never a join (measured in
    * BpeSpec). */
  lazy val Merges1k: Seq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges_1k.tsv")
    require(in != null, "bpe_merges_1k.tsv missing from resources")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().map { l =>
      val t = l.split("\t", 2); (t(0), t(1))
    }.toVector
    finally in.close()
  }

  /** Each merge side must be one code point or an earlier merge's
    * output — the invariant the one-pass-per-pair application and the
    * oracle's REPLACE chain both rest on. */
  private[graft] def wellFormed(merges: Seq[(String, String)]): Boolean = {
    val outputs = scala.collection.mutable.Set.empty[String]
    merges.forall { case (a, b) =>
      def ok(s: String) =
        s.nonEmpty && (s.codePointCount(0, s.length) == 1 || outputs(s))
      val r = ok(a) && ok(b)
      outputs += a + b
      r
    }
  }

  /** BPE symbol count of one word under `merges` (rank order, each pair
    * merged left-to-right non-overlapping). */
  private[graft] def countWord(word: String,
      merges: Array[(String, String)]): Int = {
    var syms = {
      val cps = word.codePoints().toArray
      val a = new Array[String](cps.length)
      var i = 0
      while (i < cps.length) {
        a(i) = new String(Character.toChars(cps(i))); i += 1
      }
      a
    }
    var m = 0
    while (m < merges.length && syms.length > 1) {
      val (a, b) = merges(m)
      // cheap containment pre-check would rescan; the direct fuse scan is
      // already O(len)
      val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += a + b; i += 2
        } else { out += syms(i); i += 1 }
      }
      if (out.length < syms.length) syms = out.toArray
      m += 1
    }
    syms.length
  }

  /** Per-document BPE token counts: ("<idCol>", "bpe_tokens") — the sum
    * of per-word symbol counts; 0 for empty/blank/null text. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)] = DefaultMerges): DataFrame = {
    require(wellFormed(merges),
      "merge table must be rank-ordered with sides that are single chars " +
        "or earlier outputs")
    val m = merges.toArray
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val words =
            if (text == null || text.trim.isEmpty) Array.empty[String]
            else text.trim.split("\\s+")
          var total = 0L
          var i = 0
          while (i < words.length) { total += countWord(words(i), m); i += 1 }
          (id, total)
        }
      }.toDF(idCol, "bpe_tokens")
  }

  /** The DuckDB oracle's per-word expression for the same merge table: a
    * chain of boundary-safe REPLACEs over the "(c) (c) …" wrapped form.
    * Generated from the table so Spark and oracle cannot drift. Only for
    * SMALL tables: DuckDB's binder caps expression nesting at 128 —
    * bigger tables go through [[oracleCtes]]. */
  private[graft] def oracleWordExpr(wordCol: String,
      merges: Seq[(String, String)] = DefaultMerges): String = {
    val spaced = "array_to_string(list_transform(string_split(" + wordCol +
      ", ''), x -> '(' || x || ')'), ' ')"
    merges.foldLeft(spaced) { case (acc, (a, b)) =>
      s"REPLACE($acc, '($a) ($b)', '($a$b)')"
    }
  }

  /** Staged form of the oracle REPLACE chain for merge tables past
    * DuckDB's 128-deep expression-nesting cap: the chain is cut into
    * CTE stages of `batch` REPLACEs each (m1..mN over a running `t`
    * column), so nesting depth stays ~`batch` regardless of table size
    * — 1000 merges = 10 stages, measured ~0.5 s to run (BpeSpec pins
    * generation cost and depth). Returns (cteList, finalCteName); the
    * caller splices them after its own word-producing CTE `src`, which
    * must expose `doc_id` and `wordCol`. */
  private[graft] def oracleCtes(src: String, wordCol: String,
      merges: Seq[(String, String)], batch: Int = 100): (String, String) = {
    val spaced = "array_to_string(list_transform(string_split(" + wordCol +
      ", ''), x -> '(' || x || ')'), ' ')"
    val groups = merges.grouped(batch).toVector
    val sb = new StringBuilder(
      s"m0 AS (SELECT doc_id, $spaced AS t FROM $src)")
    groups.zipWithIndex.foreach { case (g, gi) =>
      val expr = g.foldLeft("t") { case (acc, (a, b)) =>
        s"REPLACE($acc, '($a) ($b)', '($a$b)')"
      }
      sb.append(s",\n          m${gi + 1} AS (SELECT doc_id, $expr AS t FROM m$gi)")
    }
    (sb.toString, s"m${groups.length}")
  }
}
