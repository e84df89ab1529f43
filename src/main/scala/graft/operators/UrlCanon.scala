package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl dedup, full rule set (the
  * CCNet/RefinedWeb-class URL-level dedup front: Wenzek et al. 2020,
  * Penedo et al. 2023 both dedup crawl shards by normalized URL before
  * any content pass).
  *
  * Relationship to [[graft.functions.Urls]] (L74, r8): that operator
  * is the deliberately FIXED subset (fragment, case, tracking params,
  * param sort) whose scaladoc lists default-port stripping and path
  * slash handling as documented non-goals. THIS operator (r13) closes
  * those non-goals — the KMV-closes-L71's-fence pattern — while
  * keeping the two remaining parser-grade cases (dot-segments,
  * percent-encoding) documented out on both. L74 stays as-is with its
  * own battery pin; new pipelines should canonicalize with this one.
  *
  * Collapse the variant spellings crawlers emit for one resource so
  * URL-level dedup and per-site rollups key on the RESOURCE:
  *
  *   - scheme and host lowercase (RFC 3986 §6.2.2.1 case
  *     normalization);
  *   - default port stripped (`:80` for http, `:443` for https — only
  *     for the MATCHING scheme; a non-default or cross-scheme port is
  *     meaningful and survives);
  *   - duplicate path slashes collapsed, trailing slash stripped
  *     (except the root path, which stays `/`; an empty path becomes
  *     `/` — RFC 3986 §6.2.3);
  *   - query params: tracking params dropped ([[TrackingParamRe]] —
  *     the utm_* / click-id family), empties dropped, the REMAINDER
  *     SORTED (order-insensitive dedup; documented: a server that
  *     treats param order as meaningful is out of scope) and an empty
  *     result drops the `?` entirely;
  *   - fragment dropped (never sent to the server);
  *   - a string with no `scheme://authority` prefix is NOT a URL here
  *     ⇒ NULL (curation drops it rather than keying garbage).
  *
  * Deliberately OUT of scope, documented: dot-segment (`/../`)
  * resolution (crawlers emit resolved URLs; a stack fold is
  * Spark-expressible via `aggregate` but DuckDB's `list_reduce` cannot
  * carry a list accumulator, so the rule would be un-oracled) and
  * percent-encoding normalization (locale/charset rabbit hole).
  *
  * Scale shape: ONE codegen'd expression chain — regexp extracts,
  * a split + higher-order filter + array_sort over the (short) param
  * list, string concat. No UDF, no join, no shuffle; canonicalization
  * fuses into the scan, and the dedup rollup after it is one hash
  * aggregation. Idempotence (canon ∘ canon = canon) is spec-pinned —
  * the property that makes re-canonicalizing an already-clean table a
  * no-op instead of a corruption. */
object UrlCanon {

  /** Tracking-param regex (anchored at the param NAME): the utm_*
    * family plus the common click-ids. Shared verbatim with the
    * oracle. */
  val TrackingParamRe = "^(utm_[^=]*|fbclid|gclid|msclkid|ref)="

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.\\-]*)://"
  private val AuthRe = "^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)"
  private val PathRe = "^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*([^?#]*)"

  /** The canonical form of `url` as a pure Catalyst expression; NULL
    * for strings without a `scheme://authority` prefix. */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, SchemeRe, 1))
    val auth = lower(regexp_extract(url, AuthRe, 1))
    val authNp = when(scheme === "http",
        regexp_replace(auth, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth, ":443$", ""))
      .otherwise(auth)
    val collapsed = regexp_replace(
      regexp_extract(url, PathRe, 1), "/{2,}", "/")
    val path = when(collapsed === "" || collapsed === "/", lit("/"))
      .otherwise(regexp_replace(collapsed, "/$", ""))
    val kept = array_join(
      array_sort(filter(split(regexp_extract(url, "\\?([^#]*)", 1), "&"),
        x => !(x.rlike(TrackingParamRe) || x === ""))), "&")
    when(scheme === "" || auth === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), authNp, path,
        when(kept === "", lit("")).otherwise(concat(lit("?"), kept))))
  }

  /** URL-level dedup rollup: one row per canonical URL with the
    * variant-doc count and the id-sum membership witness (the house
    * entity_sum form). Docs whose url fails to parse drop (they are
    * not THE resource of any canonical key). */
  def dedupReport(df: DataFrame, idCol: String, urlCol: String)
      : DataFrame =
    df.filter(col(idCol).isNotNull)
      .select(col(idCol), canonicalize(col(urlCol)).as("canon_url"))
      .filter(col("canon_url").isNotNull)
      .groupBy(col("canon_url"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(idCol).cast("decimal(38,0)")).cast("string")
          .as("doc_id_sum"))
}
