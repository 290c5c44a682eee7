package graft.ingest

import java.time.LocalDate
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Probe-record shape (probing/s3_vision.py:24-34). */
case class ProbeResult(
    symbol: String,
    date: java.sql.Date,
    available: Boolean,
    file_size_bytes: Option[Long],
    last_modified: Option[java.sql.Timestamp],
    url: String,
    status_code: Int,
    probe_timestamp: java.sql.Timestamp)

/** Ingestion-side adapters (SURVEY.md §2.1 S10–S17): URL building with
  * Unicode-safe percent-encoding, file-listing parsers, 1d-kline CSV
  * mapping, symbol classification, and probe fan-out plumbing.
  *
  * Network collectors are injected as functions so tests (and offline
  * environments) supply fixtures; the Spark side — domain cross-join,
  * partitioned fan-out via mapPartitions, record assembly — is real.
  */
object Ingest {

  // ---- C11: percent-encoding (s3_vision.py:64-72) ---------------------

  /** Percent-encode like Python's `urllib.parse.quote(s, safe="")`:
    * UTF-8 bytes, unreserved = ALPHA / DIGIT / '-' / '.' / '_' / '~'.
    * (java.net.URLEncoder is NOT equivalent: it emits '+' for space and
    * keeps '*'.) Goldens: tests/test_probing/test_unicode_symbols.py:29-80.
    */
  def percentEncode(s: String): String = {
    val sb = new StringBuilder
    s.getBytes("UTF-8").foreach { b =>
      val c = b & 0xff
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
          (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~')
        sb.append(c.toChar)
      else sb.append(f"%%$c%02X")
    }
    sb.toString
  }

  private val encodeUdf = udf(percentEncode _)

  /** Probe URL for (symbol, date) — s3_vision.py:64-72 pattern. */
  def probeUrl(symbol: Column, date: Column): Column = {
    val enc = encodeUdf(symbol)
    concat(
      lit("https://data.binance.vision/data/futures/um/daily/klines/"),
      enc, lit("/1m/"), enc, lit("-1m-"),
      date_format(date, "yyyy-MM-dd"), lit(".zip"))
  }

  // ---- C13: symbol classification (s3_symbol_discovery.py:149-179) ----

  /** "delivery" iff the symbol ends `_YYMMDD` with a VALID date (strict
    * calendar check via try_to_date, e.g. _991332 stays perpetual);
    * otherwise "perpetual". Pure built-ins — no UDF.
    */
  def classifySymbol(symbol: Column): Column = {
    val suffix = regexp_extract(symbol, "_([0-9]{6})$", 1)
    when(suffix =!= "" &&
        call_function("try_to_date", suffix, lit("yyMMdd")).isNotNull,
      lit("delivery")).otherwise(lit("perpetual"))
  }

  // ---- C10: RFC-2822 timestamp parse (s3_vision.py:86-93) -------------

  /** Parse an HTTP `Last-Modified` header ("Tue, 16 Jan 2024 02:15:32
    * GMT") to a timestamp; NULL on malformed input (probe rows keep
    * last_modified nullable rather than failing the batch).
    */
  def parseRfc2822(c: Column): Column =
    // Spark 4's parser rejects day-of-week ('EEE') in parse patterns;
    // the weekday is redundant in RFC 2822 — strip it and parse the rest.
    call_function("try_to_timestamp",
      regexp_replace(c, "^[A-Za-z]{3}, ", ""), lit("dd MMM yyyy HH:mm:ss zzz"))

  // ---- S13: AWS-CLI listing parser (aws_s3_lister.py:60-120) ----------

  /** Parse `aws s3 ls` stdout lines ("DATE TIME SIZE FILENAME") into
    * availability records, excluding .CHECKSUM entries and malformed
    * lines — all regexp/split built-ins, fully distributed.
    */
  def parseAwsLs(lines: DataFrame, lineCol: String, symbol: String): DataFrame = {
    val pat = s"^(\\d{4}-\\d{2}-\\d{2}) (\\d{2}:\\d{2}:\\d{2}) +(\\d+) (.*)$$"
    val fnamePat = java.util.regex.Pattern.quote(symbol) + "-1m-(\\d{4}-\\d{2}-\\d{2})\\.zip$"
    lines
      // try_* variants: malformed lines yield NULL and are filtered, they
      // must not abort the job (ANSI mode makes plain casts throw).
      .withColumn("last_modified",
        call_function("try_to_timestamp", concat(regexp_extract(col(lineCol), pat, 1),
          lit(" "), regexp_extract(col(lineCol), pat, 2))))
      .withColumn("file_size_bytes",
        when(regexp_extract(col(lineCol), pat, 3) =!= "",
          regexp_extract(col(lineCol), pat, 3)).cast(LongType))
      .withColumn("filename", regexp_extract(col(lineCol), pat, 4))
      .withColumn("date", call_function("try_to_date", regexp_extract(col("filename"), fnamePat, 1)))
      .filter(col("date").isNotNull && !col("filename").contains(".CHECKSUM"))
      .withColumn("symbol", lit(symbol))
      .withColumn("url", concat(
        lit("https://data.binance.vision/data/futures/um/daily/klines/"),
        lit(symbol), lit("/1m/"), col("filename")))
      .select("symbol", "date", "file_size_bytes", "last_modified", "url")
  }

  // ---- S14: 1d-kline CSV → 9 metrics (aws_s3_lister.py:235-294) -------

  /** Map raw 1d-kline CSV content (header-optional, 12 positional
    * fields) to the 9 volume/price metrics. Input: one row per
    * (symbol, date, csv_content). Malformed content (wrong row or field
    * count) yields `parse_ok = false` with NULL metrics — the caller
    * decides whether to fail the batch (reference raises, ADR-0003).
    */
  def parseKlineCsv(df: DataFrame, symbolCol: String, dateCol: String,
                    csvCol: String): DataFrame = {
    val rows = split(regexp_replace(col(csvCol), "\r", ""), "\n")
    val dataRows = filter(rows, r => length(trim(r)) > 0)
    // Header-optional: 2 rows → take the 2nd, 1 row → take it.
    val row = when(size(dataRows) === 2, element_at(dataRows, 2))
      .when(size(dataRows) === 1, element_at(dataRows, 1))
    val f = split(row, ",")
    // try_cast, NOT cast: under ANSI (Spark 4 default) a plain cast of a
    // garbage field would abort the whole batch instead of flagging the
    // row; parse_ok additionally requires a numeric open_time so a
    // header-only file (12 names, no data) reads as not-parsed.
    def tnum(i: Int, t: String) = expr(s"try_cast(element_at(f, $i) AS $t)")
    df.select(
        col(symbolCol).as("symbol"), col(dateCol).as("date"), f.as("f"),
        (row.isNotNull && size(f) === 12).as("has12"))
      .withColumn("parse_ok",
        col("has12") && tnum(1, "BIGINT").isNotNull)
      .select(
        col("symbol"), col("date"), col("parse_ok"),
        when(col("parse_ok"), tnum(8, "DOUBLE")).as("quote_volume_usdt"),
        when(col("parse_ok"), tnum(9, "BIGINT")).as("trade_count"),
        when(col("parse_ok"), tnum(6, "DOUBLE")).as("volume_base"),
        when(col("parse_ok"), tnum(10, "DOUBLE")).as("taker_buy_volume_base"),
        when(col("parse_ok"), tnum(11, "DOUBLE")).as("taker_buy_quote_volume_usdt"),
        when(col("parse_ok"), tnum(2, "DOUBLE")).as("open_price"),
        when(col("parse_ok"), tnum(3, "DOUBLE")).as("high_price"),
        when(col("parse_ok"), tnum(4, "DOUBLE")).as("low_price"),
        when(col("parse_ok"), tnum(5, "DOUBLE")).as("close_price"))
  }

  // ---- S11/S12: probe fan-out (batch_prober.py:65-201) ----------------

  /** 20-day-style lookback window: end = today−1, start = end−(n−1)
    * (run_daily_update.py:44-48; FIXTURES.md §8).
    */
  def lookbackWindow(today: LocalDate, days: Int): (LocalDate, LocalDate) = {
    val end = today.minusDays(1)
    (end.minusDays(days - 1L), end)
  }

  /** Distributed probe fan-out: dates × symbols domain, repartitioned so
    * each Spark task runs a batch with its own pooled client (the
    * executor-task grid replaces the reference's ThreadPoolExecutor(150)).
    * The prober is injected — HTTP in production, fixtures in tests.
    */
  def probeDomain(spark: SparkSession, dates: Seq[LocalDate], symbols: Seq[String],
                  parallelism: Int)(prober: (String, LocalDate) => ProbeResult): Dataset[ProbeResult] = {
    import spark.implicits._
    val domain = for (d <- dates; s <- symbols) yield (s, d.toString)
    spark.createDataset(domain)
      .repartition(parallelism)
      .mapPartitions { it =>
        // One connection pool per task/partition in the real adapter
        // (s3_vision.py:16-21 pool; batch_prober.py:49-63 DNS warm).
        it.map { case (s, d) => prober(s, LocalDate.parse(d)) }
      }
  }

  // ---- S15: S3 XML bucket-listing parse (s3_symbol_discovery.py:25-146)

  /** One parsed page of an S3 `ListBucketResult`: the symbol directory
    * names under the prefix, plus the pagination cursor.
    */
  case class S3ListingPage(symbols: Seq[String], isTruncated: Boolean,
                           nextMarker: Option[String])

  /** Parse one S3 XML listing page: symbols come from
    * `CommonPrefixes/Prefix` (last path segment), pagination from
    * `IsTruncated`/`NextMarker`. Namespace-agnostic tag matching — S3
    * serves the 2006-03-01 namespace but fixtures may omit it.
    * JDK DOM only; no extra dependencies.
    */
  def parseS3ListingPage(xml: String): S3ListingPage = {
    val factory = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    factory.setNamespaceAware(true) // required for the NS-wildcard lookups below
    // The body comes off the network: disable DOCTYPE/external entities
    // so a spoofed listing can't XXE-read driver files or entity-bomb us.
    factory.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    factory.setFeature("http://xml.org/sax/features/external-general-entities", false)
    factory.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    factory.setXIncludeAware(false)
    factory.setExpandEntityReferences(false)
    val doc = factory.newDocumentBuilder()
      .parse(new org.xml.sax.InputSource(new java.io.StringReader(xml)))
    def texts(tag: String): Seq[String] = {
      val nodes = doc.getElementsByTagNameNS("*", tag)
      (0 until nodes.getLength).map(nodes.item(_).getTextContent)
    }
    val prefixes = {
      val cps = doc.getElementsByTagNameNS("*", "CommonPrefixes")
      (0 until cps.getLength).flatMap { i =>
        val kids = cps.item(i).getChildNodes
        (0 until kids.getLength).collect {
          case j if "Prefix" == kids.item(j).getLocalName =>
            kids.item(j).getTextContent
        }
      }
    }
    val symbols = prefixes.map(_.stripSuffix("/").split("/").last).filter(_.nonEmpty)
    S3ListingPage(
      symbols,
      texts("IsTruncated").headOption.contains("true"),
      texts("NextMarker").headOption.filter(_.nonEmpty))
  }

  /** Paginated discovery over the injected page fetcher (HTTP in
    * production, fixtures in tests): follows `NextMarker`, falling back
    * to `<prefix><lastSymbol>/` when S3 omits it (the reference's
    * fallback, s3_symbol_discovery.py:118-127). The page loop is
    * driver-side by nature — S3 pagination is serial — and the result is
    * a small dimension destined for broadcast.
    */
  def discoverSymbols(fetchPage: Option[String] => String,
                      prefix: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val seen = scala.collection.mutable.Set.empty[String]
    var marker: Option[String] = None
    var done = false
    while (!done) {
      val page = parseS3ListingPage(fetchPage(marker))
      out ++= page.symbols
      if (!page.isTruncated) done = true
      else {
        val next = page.nextMarker
          .orElse(page.symbols.lastOption.map(last => s"$prefix$last/"))
        next match {
          case Some(m) if marker.contains(m) || seen(m) =>
            // A flaky endpoint re-serving a page OR a marker CYCLE
            // (A→B→A) would otherwise spin this loop forever
            // (strict-raise, ADR-0003).
            throw new IllegalStateException(
              s"S3 listing pagination did not advance past marker $m")
          case Some(m) => seen += m; marker = Some(m)
          case None    => done = true
        }
      }
    }
    out.result().distinct // overlapping pages must not yield duplicate rows
  }

  /** Discovered symbols classified perpetual/delivery, as a broadcastable
    * (symbol, kind) frame — the Spark-side hand-off of S15 discovery
    * (s3_symbol_discovery.py:129-146).
    */
  def discoveredSymbolsDF(spark: SparkSession,
                          fetchPage: Option[String] => String,
                          prefix: String): DataFrame = {
    import spark.implicits._
    discoverSymbols(fetchPage, prefix).toDF("symbol")
      .withColumn("kind", classifySymbol(col("symbol")))
  }

  // ---- S17: exchangeInfo JSON source (validation/cross_check.py:37-77) -

  /** Parse a Binance `exchangeInfo` response body into the set of
    * currently-trading USDT perpetual symbols — the API side of the
    * cross-check validator. Distributed JSON parse (spark.read.json over
    * a one-row dataset mirrors how a fleet of responses would land);
    * filter semantics match the reference exactly: contractType
    * PERPETUAL, status TRADING, symbol ends in USDT.
    */
  def parseExchangeInfo(spark: SparkSession, json: String): DataFrame = {
    import spark.implicits._
    spark.read.json(Seq(json).toDS())
      .select(explode(col("symbols")).as("s"))
      .select(col("s.symbol").as("symbol"), col("s.status").as("status"),
        col("s.contractType").as("contractType"))
      .filter(col("contractType") === "PERPETUAL" &&
        col("status") === "TRADING" && col("symbol").endsWith("USDT"))
      .select("symbol")
  }

  // ---- S16: symbols.json loader (config/symbol_loader.py:15-87) -------

  /** Load {metadata, perpetual_symbols: [...], delivery_symbols: [...]}
    * into a (symbol, kind) frame destined for broadcast.
    */
  def loadSymbols(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", true).json(path)
    val perp = raw.select(explode(col("perpetual_symbols")).as("symbol"))
      .withColumn("kind", lit("perpetual"))
    val deliv = raw.select(explode(col("delivery_symbols")).as("symbol"))
      .withColumn("kind", lit("delivery"))
    perp.unionByName(deliv)
  }
}
