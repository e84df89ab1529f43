package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.PaginatedRest.{PageFetcher, RetryPolicy}

/** Factory contract for building a [[PageFetcher]] on executors from the
  * connector's string options (a fetcher instance itself can't ride
  * through DataSourceV2's option map). Implementations need a no-arg
  * constructor. */
trait FetcherFactory extends Serializable {
  def create(options: Map[String, String]): PageFetcher
}

/** [[MockQboApi]] factory for tests/demos: reads `total`. */
final class MockQboApiFactory extends FetcherFactory {
  def create(options: Map[String, String]): PageFetcher =
    MockQboApi(options.getOrElse("total", "29").toInt)
}

/** Real-HTTP factory: builds [[HttpQboApi.HttpPageFetcher]] from connector
  * options — `baseUrl` + `entity`, with either a pre-issued static `token`
  * or the full OAuth2 round-trip (`tokenUrl` + `clientId` +
  * `clientSecret`, cached JVM-wide per client id so a cluster does one
  * token fetch per executor per expiry window). This is the production
  * wiring of the V2 source; HttpQboApiSpec drives it against an
  * in-process localhost server. */
final class HttpFetcherFactory extends FetcherFactory {
  // DSv2 options are case-insensitive: the merged map holds the user's
  // original-case keys plus lowercased copies, so fall back to the
  // lowercase form, and fail with a NAMED error instead of a bare
  // key-not-found at executor time.
  private def opt(options: Map[String, String], key: String): Option[String] =
    options.get(key).orElse(options.get(key.toLowerCase))
  private def required(options: Map[String, String], key: String): String =
    opt(options, key).getOrElse(throw new IllegalArgumentException(
      s"HttpFetcherFactory: missing required option '$key'"))

  def create(options: Map[String, String]): PageFetcher = {
    val tokens: PaginatedRest.TokenProvider = opt(options, "token") match {
      case Some(t) => PaginatedRest.StaticToken(t)
      case None =>
        val tokenUrl = required(options, "tokenUrl")
        val clientId = required(options, "clientId")
        // key the JVM-wide token cache by client AND endpoint — the same
        // clientId against two token endpoints (sandbox vs production)
        // must not share a bearer token
        new PaginatedRest.RefreshingToken(
          HttpQboApi.oauthTokenFetch(tokenUrl, clientId,
            required(options, "clientSecret")),
          shareKey = Some(s"$clientId@$tokenUrl"))
    }
    HttpQboApi.HttpPageFetcher(required(options, "baseUrl"),
      opt(options, "entity").getOrElse("Customer"), tokens)
  }
}

/** S1 as a real DataSourceV2 `TableProvider` — the declared v1 of the
  * paginated REST source (SURVEY §4.2, §7.1 M3; the `mapPartitions` form in
  * [[PaginatedRest]] is the v0). One `InputPartition` per page; pages fetch
  * CONCURRENTLY on executors with per-task retry/backoff, vs the
  * reference's sequential driver loop (extract_qb_customers_py.py:35-59).
  *
  * Paging without a driver round-trip per page: `pages` declares the
  * partition count (from an API count endpoint, or a generous upper
  * bound) — pages past the data return empty, which is harmless overshoot,
  * so exact cardinality knowledge is NOT required. Usage:
  *
  * {{{
  * spark.read.format("graft.sources.RestDataSourceV2")
  *   .option("factory", "graft.sources.MockQboApiFactory")
  *   .option("total", "29")          // factory-specific options pass through
  *   .option("pageSize", "100")
  *   .option("pages", "4")
  *   .load()                          // page_number, start_position, record
  * }}}
  */
class RestDataSourceV2 extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RestDataSourceV2.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RestTable(properties)
}

object RestDataSourceV2 {
  val Schema: StructType = StructType.fromDDL(
    "page_number BIGINT, start_position BIGINT, record STRING")
}

private class RestTable(properties: util.Map[String, String])
  extends Table with SupportsRead {
  override def name(): String = "paginated_rest"
  override def schema(): StructType = RestDataSourceV2.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    import scala.jdk.CollectionConverters._
    new RestScanBuilder(properties.asScala.toMap ++ options.asScala.toMap)
  }
}

private class RestScanBuilder(options: Map[String, String])
  extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = RestDataSourceV2.Schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val pages = options.getOrElse("pages", "1").toInt
    val pageSize = options.getOrElse("pageSize", "100").toInt
    Array.tabulate(pages)(p => RestPage(p, pageSize, options))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new RestReaderFactory
}

private case class RestPage(page: Int, pageSize: Int,
    options: Map[String, String]) extends InputPartition

private class RestReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RestPage]
    new PartitionReader[InternalRow] {
      private val fetcher = Class.forName(p.options("factory"))
        .getDeclaredConstructor().newInstance()
        .asInstanceOf[FetcherFactory].create(p.options)
      private val retry = RetryPolicy(
        maxRetries = p.options.getOrElse("maxRetries", "3").toInt,
        initialBackoffMs = p.options.getOrElse("backoffMs", "500").toLong)
      private val start = p.page.toLong * p.pageSize + 1
      private val it = retry.run(fetcher.fetch(start, p.pageSize)).iterator
      private var current: String = _
      override def next(): Boolean =
        if (it.hasNext) { current = it.next(); true } else false
      override def get(): InternalRow =
        InternalRow(p.page + 1L, start, UTF8String.fromString(current))
      override def close(): Unit = ()
    }
  }
}
