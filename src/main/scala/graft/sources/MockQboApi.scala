package graft.sources

import graft.sources.PaginatedRest.PageFetcher

/** Mock QBO-shaped API for the runnable pipeline demo and the e2e tests —
  * serves `total` customer records "1".."total" in `maxResults` pages, JSON
  * shaped per FIXTURES.md §2/§5 (the real system's network boundary; a
  * production deployment implements [[PageFetcher]] with HTTP + OAuth
  * instead — extract_qb_customers_py.py:31-59). */
final case class MockQboApi(total: Int) extends PageFetcher {
  def fetch(startPosition: Long, maxResults: Int): Seq[String] = {
    val from = startPosition.toInt
    val to = math.min(from + maxResults - 1, total)
    if (from > total) Seq.empty
    else (from to to).map(i =>
      s"""{"Id":"$i","DisplayName":"Customer $i","Active":true,
         "Balance":${i * 10.5},"MetaData":
         {"LastUpdatedTime":"2025-08-0${i % 9 + 1}T16:52:08-07:00"}}""")
  }
}
