package graft

import java.time.LocalDate
import org.apache.spark.sql.functions._
import graft.ingest.{Ingest, ProbeResult}

class IngestSpec extends SparkSpec {

  test("percent-encoding matches Python quote(safe='') goldens (test_unicode_symbols.py:29-80)") {
    Ingest.percentEncode("币安人生USDT") shouldBe
      "%E5%B8%81%E5%AE%89%E4%BA%BA%E7%94%9FUSDT"
    Ingest.percentEncode("🚀USDT") shouldBe "%F0%9F%9A%80USDT"
    Ingest.percentEncode("BTCUSDT") shouldBe "BTCUSDT"
    Ingest.percentEncode("A B*C") shouldBe "A%20B%2AC" // space is %20, not '+'
  }

  test("probe URL matches the s3_vision.py:64-72 pattern") {
    import spark.implicits._
    val url = Seq(("BTCUSDT", java.sql.Date.valueOf("2024-01-15")))
      .toDF("symbol", "date")
      .select(Ingest.probeUrl(col("symbol"), col("date")).as("url"))
      .collect().head.getString(0)
    url shouldBe "https://data.binance.vision/data/futures/um/daily/klines/" +
      "BTCUSDT/1m/BTCUSDT-1m-2024-01-15.zip"
  }

  test("classifySymbol: valid _YYMMDD suffix → delivery, invalid date → perpetual (FIXTURES.md §10)") {
    import spark.implicits._
    val out = Seq("BTCUSDT", "BTCUSDT_231229", "ETHUSDT_991332", "A_B", "X_12345")
      .toDF("symbol")
      .select(col("symbol"), Ingest.classifySymbol(col("symbol")).as("kind"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    out("BTCUSDT") shouldBe "perpetual"
    out("BTCUSDT_231229") shouldBe "delivery"
    out("ETHUSDT_991332") shouldBe "perpetual" // month 13 is not a date
    out("A_B") shouldBe "perpetual"
    out("X_12345") shouldBe "perpetual" // 5 digits
  }

  test("parseAwsLs: data rows parsed, CHECKSUM and malformed lines dropped (aws_s3_lister.py:60-120)") {
    import spark.implicits._
    val lines = Seq(
      "2022-03-21 01:58:10      56711 BTCUSDT-1m-2019-12-31.zip",
      "2022-03-21 01:58:10         92 BTCUSDT-1m-2019-12-31.zip.CHECKSUM",
      "2022-03-22 02:00:00      60000 BTCUSDT-1m-2020-01-01.zip",
      "garbage line",
      "").toDF("line")
    val out = Ingest.parseAwsLs(lines, "line", "BTCUSDT").orderBy("date").collect()
    out.length shouldBe 2
    out(0).getAs[java.sql.Date]("date").toString shouldBe "2019-12-31"
    out(0).getAs[Long]("file_size_bytes") shouldBe 56711L
    out(0).getAs[String]("url") should endWith("BTCUSDT/1m/BTCUSDT-1m-2019-12-31.zip")
    out(1).getAs[java.sql.Date]("date").toString shouldBe "2020-01-01"
  }

  test("parseKlineCsv maps the 12 positional fields to 9 metrics, header-optional (FIXTURES.md §9)") {
    import spark.implicits._
    val data = "1705276800000,42000.1,43000.9,41500.5,42500.3,12345.6," +
      "1705363199999,523456789.12,98765,6000.3,255000000.5,0"
    val withHeader = "open_time,open,high,low,close,volume,close_time," +
      "quote_volume,count,taker_buy_volume,taker_buy_quote_volume,ignore\n" + data
    val bad = "only,three,fields"
    val df = Seq(
      ("BTCUSDT", "2024-01-15", data),
      ("ETHUSDT", "2024-01-15", withHeader),
      ("BAD", "2024-01-15", bad)).toDF("symbol", "date", "csv")
    val out = Ingest.parseKlineCsv(df, "symbol", "date", "csv")
      .collect().map(r => r.getAs[String]("symbol") -> r).toMap
    out("BTCUSDT").getAs[Boolean]("parse_ok") shouldBe true
    out("BTCUSDT").getAs[Double]("quote_volume_usdt") shouldBe 523456789.12
    out("BTCUSDT").getAs[Long]("trade_count") shouldBe 98765L
    out("BTCUSDT").getAs[Double]("open_price") shouldBe 42000.1
    out("BTCUSDT").getAs[Double]("close_price") shouldBe 42500.3
    out("BTCUSDT").getAs[Double]("taker_buy_quote_volume_usdt") shouldBe 255000000.5
    out("ETHUSDT").getAs[Boolean]("parse_ok") shouldBe true
    out("ETHUSDT").getAs[Double]("quote_volume_usdt") shouldBe 523456789.12
    out("BAD").getAs[Boolean]("parse_ok") shouldBe false
    out("BAD").isNullAt(out("BAD").fieldIndex("quote_volume_usdt")) shouldBe true
  }

  test("parseRfc2822 parses Last-Modified headers, NULL on garbage (s3_vision.py:86-93)") {
    import spark.implicits._
    val out = Seq("Tue, 16 Jan 2024 02:15:32 GMT", "not a date")
      .toDF("lm").select(Ingest.parseRfc2822(col("lm")).as("ts")).collect()
    out(0).getTimestamp(0).toInstant.toString shouldBe "2024-01-16T02:15:32Z"
    out(1).isNullAt(0) shouldBe true
  }

  test("lookbackWindow date math (test_20day_lookback.py:24-60, FIXTURES.md §8)") {
    val today = LocalDate.parse("2024-01-20")
    Ingest.lookbackWindow(today, 1) shouldBe
      (LocalDate.parse("2024-01-19"), LocalDate.parse("2024-01-19"))
    Ingest.lookbackWindow(today, 7) shouldBe
      (LocalDate.parse("2024-01-13"), LocalDate.parse("2024-01-19"))
    Ingest.lookbackWindow(today, 20) shouldBe
      (LocalDate.parse("2023-12-31"), LocalDate.parse("2024-01-19"))
  }

  test("loadSymbols reads the symbols.json shape into a (symbol, kind) frame (FIXTURES.md §10)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-symbols")
    val f = dir.resolve("symbols.json")
    java.nio.file.Files.writeString(f,
      """{ "metadata": { "total_perpetual": 2, "total_delivery": 1 },
        |  "perpetual_symbols": ["BTCUSDT", "ETHUSDT"],
        |  "delivery_symbols": ["BTCUSDT_231229"] }""".stripMargin)
    val out = Ingest.loadSymbols(spark, f.toString)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    out shouldBe Map("BTCUSDT" -> "perpetual", "ETHUSDT" -> "perpetual",
      "BTCUSDT_231229" -> "delivery")
  }

  private def s3Page(symbols: Seq[String], truncated: Boolean,
                     nextMarker: Option[String]): String = {
    val prefixes = symbols.map(s =>
      s"""<CommonPrefixes><Prefix>data/futures/um/daily/klines/$s/</Prefix></CommonPrefixes>""")
      .mkString("\n")
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<ListBucketResult xmlns="http://s3.amazonaws.com/doc/2006-03-01/">
       |  <Name>data.binance.vision</Name>
       |  <IsTruncated>$truncated</IsTruncated>
       |  ${nextMarker.fold("")(m => s"<NextMarker>$m</NextMarker>")}
       |  $prefixes
       |</ListBucketResult>""".stripMargin
  }

  test("parseS3ListingPage extracts CommonPrefixes symbols and pagination fields (s3_symbol_discovery.py:96-127)") {
    val page = Ingest.parseS3ListingPage(
      s3Page(Seq("BTCUSDT", "ETHUSDT"), truncated = true, Some("data/futures/um/daily/klines/ETHUSDT/")))
    page.symbols shouldBe Seq("BTCUSDT", "ETHUSDT")
    page.isTruncated shouldBe true
    page.nextMarker shouldBe Some("data/futures/um/daily/klines/ETHUSDT/")
    val last = Ingest.parseS3ListingPage(s3Page(Seq("SOLUSDT"), truncated = false, None))
    last.isTruncated shouldBe false
    last.nextMarker shouldBe None
  }

  test("discoverSymbols follows NextMarker, and falls back to last-symbol marker when absent") {
    val prefix = "data/futures/um/daily/klines/"
    // Page flow: explicit NextMarker → fallback marker (truncated, no
    // NextMarker) → final page.
    val pages = Map(
      None -> s3Page(Seq("AAAUSDT", "BBBUSDT"), truncated = true, Some(s"${prefix}BBBUSDT/")),
      Some(s"${prefix}BBBUSDT/") -> s3Page(Seq("CCCUSDT"), truncated = true, None),
      Some(s"${prefix}CCCUSDT/") -> s3Page(Seq("DDDUSDT_240329"), truncated = false, None))
    val markersSeen = scala.collection.mutable.ArrayBuffer.empty[Option[String]]
    val syms = Ingest.discoverSymbols(m => { markersSeen += m; pages(m) }, prefix)
    syms shouldBe Seq("AAAUSDT", "BBBUSDT", "CCCUSDT", "DDDUSDT_240329")
    markersSeen.toSeq shouldBe Seq(None, Some(s"${prefix}BBBUSDT/"), Some(s"${prefix}CCCUSDT/"))

    val df = Ingest.discoveredSymbolsDF(spark, m => pages(m), prefix)
    df.filter(col("kind") === "delivery").collect().map(_.getString(0)).toSeq shouldBe
      Seq("DDDUSDT_240329")
    df.count() shouldBe 4
  }

  test("discoverSymbols raises on a non-advancing pagination marker instead of spinning") {
    val prefix = "data/futures/um/daily/klines/"
    val stuck = s3Page(Seq("AAAUSDT"), truncated = true, Some(s"${prefix}AAAUSDT/"))
    an[IllegalStateException] should be thrownBy
      Ingest.discoverSymbols(_ => stuck, prefix)
    // Two-page marker CYCLE (A -> B -> A) must also raise, not loop.
    val pageA = s3Page(Seq("AAAUSDT"), truncated = true, Some("B"))
    val pageB = s3Page(Seq("BBBUSDT"), truncated = true, Some("A"))
    val cyc = Map[Option[String], String](
      None -> pageA, Some("B") -> pageB, Some("A") -> pageA)
    an[IllegalStateException] should be thrownBy
      Ingest.discoverSymbols(cyc(_), prefix)
  }

  test("parseKlineCsv: header-only file reads parse_ok=false without an ANSI cast abort") {
    import spark.implicits._
    val header = "open_time,open,high,low,close,volume,close_time," +
      "quote_volume,count,taker_buy_volume,taker_buy_quote_volume,ignore"
    val df = Seq(("BTCUSDT", "2024-01-15", header)).toDF("sym", "dt", "csv")
    val out = Ingest.parseKlineCsv(df, "sym", "dt", "csv").collect()(0)
    out.getAs[Boolean]("parse_ok") shouldBe false
    out.isNullAt(out.fieldIndex("quote_volume_usdt")) shouldBe true
  }

  test("parseS3ListingPage refuses DOCTYPE payloads (XXE hardening)") {
    val evil =
      """<?xml version="1.0"?>
        |<!DOCTYPE r [<!ENTITY x SYSTEM "file:///etc/passwd">]>
        |<ListBucketResult><IsTruncated>false</IsTruncated></ListBucketResult>""".stripMargin
    an[org.xml.sax.SAXParseException] should be thrownBy Ingest.parseS3ListingPage(evil)
  }

  test("parseExchangeInfo keeps only TRADING USDT perpetuals (cross_check.py:37-77)") {
    val json =
      """{"timezone":"UTC","symbols":[
        |{"symbol":"BTCUSDT","status":"TRADING","contractType":"PERPETUAL"},
        |{"symbol":"ETHUSDT","status":"TRADING","contractType":"PERPETUAL"},
        |{"symbol":"BTCUSDT_240329","status":"TRADING","contractType":"CURRENT_QUARTER"},
        |{"symbol":"XYZUSDT","status":"SETTLING","contractType":"PERPETUAL"},
        |{"symbol":"BTCBUSD","status":"TRADING","contractType":"PERPETUAL"}]}""".stripMargin
    Ingest.parseExchangeInfo(spark, json).orderBy("symbol")
      .collect().map(_.getString(0)).toSeq shouldBe Seq("BTCUSDT", "ETHUSDT")
  }

  test("probeDomain fans out dates × symbols through mapPartitions with an injected prober") {
    val dates = Seq(LocalDate.parse("2024-01-15"), LocalDate.parse("2024-01-16"))
    val symbols = Seq("BTCUSDT", "NEWCOINUSDT")
    val ts = java.sql.Timestamp.valueOf("2024-01-17 02:00:00")
    val out = Ingest.probeDomain(spark, dates, symbols, parallelism = 4) { (s, d) =>
      val ok = s == "BTCUSDT"
      ProbeResult(s, java.sql.Date.valueOf(d), ok,
        if (ok) Some(8421945L) else None, None,
        s"https://example/${Ingest.percentEncode(s)}-1m-$d.zip",
        if (ok) 200 else 404, ts)
    }.collect()
    out.length shouldBe 4
    out.count(_.available) shouldBe 2
    out.filter(!_.available).foreach { p =>
      p.status_code shouldBe 404
      p.file_size_bytes shouldBe None
    }
  }
}
