package graft.sources

import java.time.{LocalDate, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThanOrEqual, LessThan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 analog of the reference's Socrata REST scan (S1,
  * `etl/fact_loaders/load_311.py:11-17`): a paged remote dataset where the
  * time-range predicate and row limit are pushed INTO the source — the
  * `$where`/`$limit` SoQL parameters become page pruning + early reader
  * termination.
  *
  * Pages live as JSONL files named `page_<i>_<minDate>_<maxDate>.jsonl`
  * (dates yyyyMMdd, the page's event-time coverage — the analog of the
  * server's index). `pushFilters` keeps ts-range filters: pages whose
  * coverage misses the range are never opened; Spark re-applies the exact
  * predicate post-scan (pruning is day-granular). `pushLimit` caps rows per
  * reader.
  */
object RestPages {
  val Schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  val TsFmt: DateTimeFormatter =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
  val DateFmt: DateTimeFormatter = DateTimeFormatter.ofPattern("yyyyMMdd")

  def micros(ts: String): Long = {
    val i = LocalDateTime.parse(ts, TsFmt).toInstant(ZoneOffset.UTC)
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** Test/plan observability: partitions planned by the last scan. */
  @volatile var lastPlannedPartitions: Int = -1
}

/** Auth failure — the endpoint rejected the request token. NOT retried:
  * a 401/403 is deterministic, retrying it only burns the quota
  * (reference parity: the Socrata client sends `X-App-Token` from
  * `config/env.py:5-7` and treats auth errors as fatal).
  */
class RestAuthException(msg: String) extends RuntimeException(msg)

/** Transient endpoint failure (the 429/5xx/connection-reset class) —
  * retried with bounded exponential backoff.
  */
class RestTransientException(msg: String) extends RuntimeException(msg)

/** Client-side transport policy shared by both read paths: bounded retry
  * with exponential backoff on transient failures, fail-fast on auth.
  */
object RestRetry {
  def withRetry[T](maxRetries: Int, backoffMs: Long)(f: => T): T = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case e: RestTransientException =>
          if (attempt >= maxRetries) throw e
          if (backoffMs > 0) Thread.sleep(backoffMs << attempt)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** The simulated remote endpoint with SoQL-style `$offset`/`$limit`
  * cursor semantics: one call returns rows `[offset, offset+limit)` of a
  * page resource in stable server order. The reference issues a SINGLE
  * `$limit`-capped fetch (`load_311.py:11-17`) — that is the degenerate
  * `limit >= resource size` case of the cursor loop in [[RestReader]].
  *
  * Server-side knobs for the spec harness: [[requiredToken]] makes the
  * endpoint reject calls without the matching app token (the Socrata
  * `X-App-Token` contract); [[failNextFetches]] injects that many
  * transient failures to exercise the client's retry/backoff.
  */
object RestFetch {
  /** Test observability: endpoint calls since the last reset. */
  @volatile var fetchCalls: Int = 0
  /** When set, fetches must present this token or get an auth error. */
  @volatile var requiredToken: Option[String] = None
  /** Fault injection: the next N fetch calls fail transiently. */
  val failNextFetches = new java.util.concurrent.atomic.AtomicInteger(0)

  def fetch(resource: String, offset: Int, limit: Int,
      token: Option[String] = None): Seq[String] = {
    fetchCalls += 1
    if (resource.startsWith("http://") || resource.startsWith("https://"))
      return httpFetch(resource, offset, limit, token)
    requiredToken.foreach { want =>
      if (!token.contains(want))
        throw new RestAuthException(
          s"endpoint requires an app token (got ${token.getOrElse("none")})")
    }
    if (failNextFetches.getAndUpdate(n => math.max(0, n - 1)) > 0)
      throw new RestTransientException("injected transient endpoint failure")
    val src = scala.io.Source.fromFile(resource, "UTF-8")
    try src.getLines().slice(offset, saturatingEnd(offset, limit)).toList
    finally src.close()
  }

  private def saturatingEnd(offset: Int, limit: Int): Int =
    math.min(offset.toLong + limit, Int.MaxValue.toLong).toInt

  /** Real HTTP transport (round-7): the same SoQL-shaped cursor contract
    * over an actual socket — `GET <resource>?$offset=..&$limit=..` with
    * the app token in the `X-App-Token` header, exactly the Socrata
    * client's wire shape (reference `load_311.py:12-15`,
    * `config/env.py:5-7`). Status mapping mirrors the file transport's
    * simulated faults: 401/403 → [[RestAuthException]] (fail fast, never
    * retried), 429/5xx/connection failure → [[RestTransientException]]
    * (retried with bounded backoff by the shared [[RestRetry]] policy).
    * Public JDK only (HttpURLConnection); specs drive it against an
    * in-process loopback `com.sun.net.httpserver` — no external network.
    */
  private def httpFetch(resource: String, offset: Int, limit: Int,
      token: Option[String]): Seq[String] = {
    val sep = if (resource.contains("?")) "&" else "?"
    val url = new java.net.URL(
      resource + sep + "$offset=" + offset + "&$limit=" + limit)
    val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod("GET")
      conn.setConnectTimeout(5000)
      conn.setReadTimeout(30000)
      token.foreach(conn.setRequestProperty("X-App-Token", _))
      val code =
        try conn.getResponseCode
        catch {
          case e: java.io.IOException =>
            throw new RestTransientException(s"connect $url: ${e.getMessage}")
        }
      if (code == 401 || code == 403)
        throw new RestAuthException(
          s"endpoint requires an app token (got ${token.getOrElse("none")}): HTTP $code")
      if (code == 429 || code >= 500)
        throw new RestTransientException(s"HTTP $code from $url")
      if (code != 200)
        throw new RuntimeException(s"unexpected HTTP $code from $url")
      val src = scala.io.Source.fromInputStream(conn.getInputStream, "UTF-8")
      try src.getLines().toList finally src.close()
    } finally conn.disconnect()
  }

  /** Lazy client-side cursor: keeps issuing `fetch($offset += pageSize)`
    * calls until a short page signals exhaustion. Downstream early
    * termination (a pushed LIMIT) simply stops pulling, so no further
    * fetches are issued — cursor and limit pushdown compose. Each fetch
    * carries the app token and is individually retried.
    */
  def pagedLines(file: String, pageSize: Int, token: Option[String],
      maxRetries: Int, backoffMs: Long): Iterator[String] =
    new Iterator[String] {
      private var offset = 0
      private var cur: Iterator[String] = Iterator.empty
      private var done = false
      private def advance(): Unit =
        while (!cur.hasNext && !done) {
          val batch = RestRetry.withRetry(maxRetries, backoffMs)(
            fetch(file, offset, pageSize, token))
          offset += batch.size
          if (batch.size < pageSize) done = true
          cur = batch.iterator
        }
      override def hasNext: Boolean = { advance(); cur.hasNext }
      override def next(): String = { advance(); cur.next() }
    }
}

class RestSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RestPages.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RestTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = true
}

/** Client/transport options, threaded from the reader options to every
  * partition reader: the app token (reference `config/env.py:5-7`) plus the
  * bounded-retry policy for transient endpoint failures.
  */
case class RestClientConf(appToken: Option[String], maxRetries: Int,
    backoffMs: Long)

class RestTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"rest($path)"
  override def schema(): StructType = RestPages.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RestScanBuilder(path, options.getInt("pageSize", 0),
      RestClientConf(
        Option(options.get("appToken")),
        options.getInt("maxRetries", 3),
        options.getLong("retryBackoffMs", 100L)))
}

class RestScanBuilder(path: String, pageSize: Int, client: RestClientConf)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownLimit {
  private var tsLo: Option[Long] = None // micros, inclusive
  private var tsHi: Option[Long] = None // micros, exclusive
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = Int.MaxValue

  private def asMicros(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp =>
      Some(t.getTime * 1000L + (t.getNanos % 1000000) / 1000L)
    case i: java.time.Instant =>
      Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    filters.foreach {
      case GreaterThanOrEqual("ts", v) =>
        asMicros(v).foreach { m => tsLo = Some(m); pushed :+= GreaterThanOrEqual("ts", v) }
      case LessThan("ts", v) =>
        asMicros(v).foreach { m => tsHi = Some(m); pushed :+= LessThan("ts", v) }
      case _ => ()
    }
    // pruning is page-granular: Spark must still evaluate the exact
    // predicates, so everything is returned as residual
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pushLimit(l: Int): Boolean = { limit = l; true }
  override def build(): Scan =
    new RestScan(path, tsLo, tsHi, limit, pageSize, client)
}

class RestScan(path: String, tsLo: Option[Long], tsHi: Option[Long],
    limit: Int, pageSize: Int, client: RestClientConf) extends Scan with Batch {
  override def readSchema(): StructType = RestPages.Schema
  override def toBatch: Batch = this
  override def description(): String =
    s"RestScan(path=$path, pushedLo=$tsLo, pushedHi=$tsHi, limit=$limit, pageSize=$pageSize)"

  override def planInputPartitions(): Array[InputPartition] = {
    // The page catalog: over HTTP the server's `/index` resource lists
    // the page names (the analog of the Socrata dataset index); on the
    // file transport it is a directory listing. Pruning is identical —
    // the date coverage rides in the NAME, so no page body is opened to
    // decide, regardless of transport.
    val isHttp = path.startsWith("http://") || path.startsWith("https://")
    val names: Array[String] =
      if (isHttp)
        RestRetry.withRetry(client.maxRetries, client.backoffMs)(
          RestFetch.fetch(s"$path/index", 0, Int.MaxValue, client.appToken))
          .toArray
      else
        Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
          .map(_.getName)
    val kept = names
      .filter(_.matches("page_\\d+_\\d{8}_\\d{8}\\.jsonl"))
      .sorted
      .filter { n =>
        val parts = n.stripSuffix(".jsonl").split("_")
        val minDay = LocalDate.parse(parts(2), RestPages.DateFmt)
        val maxDay = LocalDate.parse(parts(3), RestPages.DateFmt)
        val pageLo = minDay.atStartOfDay.toInstant(ZoneOffset.UTC).getEpochSecond * 1000000L
        val pageHi = maxDay.plusDays(1).atStartOfDay.toInstant(ZoneOffset.UTC).getEpochSecond * 1000000L
        tsLo.forall(_ < pageHi) && tsHi.forall(_ > pageLo)
      }
    RestPages.lastPlannedPartitions = kept.length
    kept.map { n =>
      val resource =
        if (isHttp) s"$path/$n"
        else new java.io.File(path, n).getAbsolutePath
      RestInputPartition(resource, tsLo, tsHi, limit, pageSize,
        client): InputPartition
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new RestReaderFactory
}

case class RestInputPartition(file: String, lo: Option[Long],
    hi: Option[Long], limit: Int, pageSize: Int, client: RestClientConf)
    extends InputPartition

class RestReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new RestReader(p.asInstanceOf[RestInputPartition])
}

/** Streams one page's JSONL records, applying the pushed range + limit.
  * With `pageSize > 0` the lines arrive through the `$offset` cursor loop
  * ([[RestFetch.pagedLines]]) instead of one whole-resource fetch — the
  * Socrata client's pagination, with the single-fetch form as the
  * `pageSize = 0` default. Both paths go through the endpoint
  * ([[RestFetch.fetch]]) so the app token is presented and transient
  * failures are retried regardless of paging mode.
  */
class RestReader(p: RestInputPartition) extends PartitionReader[InternalRow] {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val lines =
    if (p.pageSize > 0)
      RestFetch.pagedLines(p.file, p.pageSize, p.client.appToken,
        p.client.maxRetries, p.client.backoffMs)
    else
      RestRetry.withRetry(p.client.maxRetries, p.client.backoffMs)(
        RestFetch.fetch(p.file, 0, Int.MaxValue, p.client.appToken)).iterator
  private var current: InternalRow = _
  private var emitted = 0

  override def next(): Boolean = {
    while (emitted < p.limit && lines.hasNext) {
      val node = mapper.readTree(lines.next())
      val us = RestPages.micros(node.get("ts").asText())
      if (p.lo.forall(us >= _) && p.hi.forall(us < _)) {
        current = new GenericInternalRow(Array[Any](
          node.get("event_id").asLong(), us,
          UTF8String.fromString(node.get("event_type").asText()),
          node.get("value").asDouble()))
        emitted += 1
        return true
      }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
