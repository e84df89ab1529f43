package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-pattern blocklist scanning — Aho–Corasick (Aho & Corasick 1975,
  * CACM 18(6)) over document text: count every occurrence of every
  * blocklist phrase in one pass per document. The operator behind
  * UT1-style domain/phrase blocklists, bad-word filters and policy
  * phrase audits in web curation: the lists run to 10⁴–10⁵ phrases, and
  * the naive per-pattern scan (L15/L23's `contains`/regex family —
  * fine for a handful of markers) is O(len × patterns) per document,
  * which at 100 TB × 10⁴ patterns is the difference between one pass
  * and ten thousand. Aho–Corasick is O(len + matches) per document
  * REGARDLESS of pattern count: the pattern set compiles once into a
  * goto/fail/output automaton, text streams through it a character at
  * a time.
  *
  * Semantics (shared verbatim with the oracle): a HIT is every
  * (start position, pattern) pair with text[start, start+|p|) = p —
  * overlapping occurrences count, patterns sharing suffixes each count
  * (the automaton's output links: "ushers" hits {she, he, hers}).
  * Case-sensitive, byte-literal (no word boundaries — a blocklist
  * phrase inside a longer word counts; document lists accordingly).
  * Output per doc: `n_hits` (total occurrences across patterns),
  * `n_patterns` (distinct patterns with ≥ 1 occurrence). Null ids or
  * texts drop.
  *
  * Scale shape: the automaton builds ONCE PER PARTITION from the
  * broadcast pattern list (the mapInPandas per-partition-init
  * discipline — build cost O(total pattern chars), amortized over the
  * partition's rows), scanning is a JIT'd typed kernel (the dHashKernel
  * discipline — per-row cost is a pointer walk, no per-pattern work),
  * output is 3 longs per doc. No join, no window, nothing pattern-count
  * shaped ever touches the plan. The oracle replays the per-position
  * substring-equality definition — O(len × patterns), affordable at
  * gate scale, which is exactly the asymmetry the operator exists to
  * beat. */
object BlocklistScan {

  /** Guard rails: the automaton is driver-built and broadcast. */
  val MaxPatterns = 100000
  val MaxTotalPatternChars = 10000000

  /** Goto/fail/output tables of the Aho–Corasick automaton. Node 0 is
    * the root; `out(s)` lists the pattern indices ENDING at state s
    * (own insertions + suffix-link outputs, pre-flattened at build
    * time so the scan never chases links). */
  private[graft] final class Automaton(patterns: Seq[String]) {
    private val gotoMaps = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
    private val outBuild = mutable.ArrayBuffer(List.empty[Int])
    // trie phase
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { ch =>
        s = gotoMaps(s).getOrElseUpdate(ch, {
          gotoMaps += mutable.Map.empty[Char, Int]
          outBuild += Nil
          gotoMaps.size - 1
        })
      }
      outBuild(s) = pi :: outBuild(s)
    }
    private val fail = new Array[Int](gotoMaps.size)
    // BFS fail-link phase, flattening suffix outputs as we go
    locally {
      val queue = mutable.Queue.empty[Int]
      gotoMaps(0).values.foreach { s => fail(s) = 0; queue += s }
      while (queue.nonEmpty) {
        val r = queue.dequeue()
        gotoMaps(r).foreach { case (ch, s) =>
          queue += s
          var f = fail(r)
          while (f != 0 && !gotoMaps(f).contains(ch)) f = fail(f)
          fail(s) = if (s != gotoMaps(f).getOrElse(ch, 0))
            gotoMaps(f).getOrElse(ch, 0) else 0
          outBuild(s) = outBuild(s) ::: outBuild(fail(s))
        }
      }
    }
    private val out: Array[Array[Int]] = outBuild.map(_.toArray).toArray

    /** (total hits, distinct-pattern bitset) for one text. */
    def scan(text: String): (Long, java.util.BitSet) = {
      val seen = new java.util.BitSet(patterns.size)
      var hits = 0L
      var s = 0
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        while (s != 0 && !gotoMaps(s).contains(ch)) s = fail(s)
        s = gotoMaps(s).getOrElse(ch, 0)
        val o = out(s)
        var j = 0
        while (j < o.length) { hits += 1; seen.set(o(j)); j += 1 }
        i += 1
      }
      (hits, seen)
    }
  }

  /** (idCol, n_hits, n_patterns) per document with non-null id and
    * text. `patterns` must be non-empty, duplicate-free, and contain
    * no empty string (an empty pattern matches every position —
    * reject loudly rather than emit len+1 hits). */
  /** The pattern-list contract, shared verbatim with
    * [[graft.streaming.StreamingBlocklist]] so the twins cannot drift
    * on what a valid blocklist is. */
  private[graft] def validatePatterns(patterns: Seq[String]): Unit = {
    require(patterns.nonEmpty, "blocklist is empty")
    require(patterns.size <= MaxPatterns,
      s"${patterns.size} patterns exceed $MaxPatterns — shard the list")
    require(patterns.forall(_.nonEmpty), "empty pattern in blocklist")
    require(patterns.distinct.size == patterns.size,
      "duplicate patterns in blocklist (counts would double)")
    require(patterns.map(_.length.toLong).sum <= MaxTotalPatternChars,
      "blocklist total size exceeds the broadcast budget")
  }

  def scan(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame = {
    validatePatterns(patterns)
    val spark = df.sparkSession
    import spark.implicits._
    val patB = spark.sparkContext.broadcast(patterns)
    df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        // per-partition automaton build — O(total pattern chars),
        // amortized over the partition's rows
        val ac = new Automaton(patB.value)
        it.map { case (id, text) =>
          val (hits, seen) = ac.scan(text)
          (id, hits, seen.cardinality().toLong)
        }
      }.toDF(idCol, "n_hits", "n_patterns")
  }
}
