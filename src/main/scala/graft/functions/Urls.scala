package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the web-curation dedup key: the same page
  * arrives as `HTTPS://Site.com/p?utm_source=x&id=1#top` and
  * `https://site.com/p?id=1`, and URL-keyed dedup/caps/blocklists only
  * work after both collapse to one canonical form (every published web
  * pipeline — CCNet, RefinedWeb, Dolma — normalizes before URL dedup).
  *
  * Rules (deliberately a FIXED, engine-portable subset): drop the
  * fragment; lowercase the scheme and authority (path and query are
  * case-SENSITIVE per RFC 3986 and stay untouched); drop tracking
  * parameters (`utm_*`, `fbclid`); sort surviving query parameters
  * (param order is almost never semantic, and sorting is what makes the
  * key canonical); drop an emptied query entirely. Everything is stock
  * codegen'd string/array functions — one narrow projection, and every
  * rule replays verbatim in the DuckDB oracle (split/filter/sort/join
  * exist on both engines), so the canonical form is oracle-exact.
  *
  * Not attempted (documented non-goals): IDN/percent-encoding
  * equivalence, default-port stripping, path dot-segment resolution —
  * the cases that need a real URL parser; rows needing them keep a
  * stable (just not fully-collapsed) key, which degrades dedup recall,
  * never correctness. r13 note: [[graft.operators.UrlCanon]] (L141)
  * closes the default-port and slash-handling non-goals with the same
  * expression-only discipline — prefer it for new pipelines; this
  * fixed subset stays pinned by its own battery query (q_t26). */
object Urls {

  private val TrackingParam = "^(utm_|fbclid=)"

  /** Canonical form of `c` under the rules above. Null stays null. */
  def normalize(c: Column): Column = {
    val noFrag = regexp_replace(c, "#.*$", "")
    // base = everything before the first '?' (substring_index returns
    // the whole string when '?' is absent)
    val base = substring_index(noFrag, "?", 1)
    val authority =
      regexp_extract(base, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", 1)
    val canonBase = concat(lower(authority),
      base.substr(length(authority) + lit(1), length(base)))
    val qpos = instr(noFrag, "?")
    val query = when(qpos > 0,
      noFrag.substr(qpos + lit(1), length(noFrag))).otherwise(lit(""))
    val params = sort_array(filter(split(query, "&"),
      p => !p.rlike(TrackingParam) && p =!= ""))
    concat(canonBase,
      when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
        .otherwise(lit("")))
  }
}
