package graft

import java.nio.file.Files
import java.sql.{Date, Timestamp}
import java.time.LocalDate
import org.apache.spark.sql.functions._
import graft.api.AvailabilityQueries
import graft.ingest.{Ingest, ProbeResult}
import graft.ops.Store

/** End-to-end lifecycle (SURVEY §3.2 + §3.3): probe fan-out → partitioned
  * store → 20-day-window re-probe upsert → query API → incremental
  * rankings archive. Everything a reference deployment does daily, as
  * one Spark pipeline over a fixture prober.
  */
object IntegrationSpec {
  val symbols = Seq("BTCUSDT", "ETHUSDT", "币安人生USDT", "NEWCOINUSDT")

  /** Deterministic fixture prober (serializable — no spec-instance
    * capture): NEWCOINUSDT lists on the 17th; everything else available
    * throughout.
    */
  def prober(s: String, d: LocalDate): ProbeResult = {
    val probeTs = Timestamp.valueOf("2024-01-21 02:00:00")
    val listed = s != "NEWCOINUSDT" || !d.isBefore(LocalDate.parse("2024-01-17"))
    ProbeResult(s, Date.valueOf(d), listed,
      if (listed) Some(1000000L + s.length) else None, None,
      s"https://data.binance.vision/data/futures/um/daily/klines/" +
        s"${Ingest.percentEncode(s)}/1m/${Ingest.percentEncode(s)}-1m-$d.zip",
      if (listed) 200 else 404, probeTs)
  }
}

class IntegrationSpec extends SparkSpec {
  import IntegrationSpec.{prober, symbols}

  private def toFact(ds: org.apache.spark.sql.Dataset[ProbeResult], volBase: Double) =
    ds.toDF()
      .withColumn("quote_volume_usdt",
        when(col("available"),
          lit(volBase) * (org.apache.spark.sql.functions.length(col("symbol"))
            .cast("double") + lit(1.0)) +
            dayofmonth(col("date")).cast("double")))
      .withColumn("trade_count",
        when(col("available"), (col("quote_volume_usdt") / 1000).cast("long")))

  test("probe → store → re-probe upsert → queries → incremental rankings archive") {
    val root = Files.createTempDirectory("graft-e2e").toString
    val factPath = s"$root/availability"
    val archive = s"$root/rankings"
    val window = Ingest.lookbackWindow(LocalDate.parse("2024-01-19"), 4)
    val dates = Iterator.iterate(window._1)(_.plusDays(1))
      .takeWhile(!_.isAfter(window._2)).toSeq

    // Day 1: probe 4 days × 4 symbols, write the partitioned store.
    val probes = Ingest.probeDomain(spark, dates, symbols, parallelism = 4)(prober)
    Store.writePartitioned(toFact(probes, 1000), factPath, "date")
    val fact = spark.read.parquet(factPath)
    fact.count() shouldBe 16

    // Query API over the store.
    AvailabilityQueries.availableSymbolsOnDate(fact, Date.valueOf("2024-01-16"))
      .collect().map(_.getString(0)).toSeq shouldBe
      Seq("BTCUSDT", "ETHUSDT", "币安人生USDT").sorted
    AvailabilityQueries.newListings(fact, Date.valueOf("2024-01-17"))
      .collect().map(_.getString(0)).toSeq shouldBe Seq("NEWCOINUSDT")

    // Build the rankings archive from the store.
    AvailabilityQueries.refreshRankingsArchive(spark, fact, archive)
    val r1 = spark.read.parquet(archive)
    r1.agg(max("date")).collect()(0).getDate(0).toString shouldBe "2024-01-18"
    // Unicode symbol survived the whole round trip with rank data.
    r1.filter(col("symbol") === "币安人生USDT").count() should be > 0L

    // Day 2: re-probe window slides one day; upsert rewrites only
    // touched partitions; the new day's probes append.
    val w2 = Ingest.lookbackWindow(LocalDate.parse("2024-01-20"), 4)
    val dates2 = Iterator.iterate(w2._1)(_.plusDays(1))
      .takeWhile(!_.isAfter(w2._2)).toSeq
    val probes2 = Ingest.probeDomain(spark, dates2, symbols, parallelism = 4)(prober)
    Store.upsert(spark, factPath, toFact(probes2, 1000), "date",
      Seq("date", "symbol"), "probe_timestamp", "status_code")
    val fact2 = spark.read.parquet(factPath)
    fact2.count() shouldBe 20 // 5 distinct dates × 4 symbols, no dupes

    // Incremental archive refresh picks up ONLY the new date.
    // r1's plan snapshot points at the pre-overwrite files — capture its
    // count before the archive is rewritten.
    val r1Count = r1.count()
    AvailabilityQueries.refreshRankingsArchive(spark, fact2, archive)
    val r2 = spark.read.parquet(archive)
    r2.agg(max("date")).collect()(0).getDate(0).toString shouldBe "2024-01-19"
    r2.count() should be > r1Count

    // Ranks remain dense and 1-based per day after the append.
    val perDay = r2.groupBy("date").agg(min("rank").as("lo"), max("rank").as("hi"),
      countDistinct("rank").as("n"))
    perDay.collect().foreach { row =>
      row.getAs[Short]("lo") shouldBe 1
      row.getAs[Long]("n").toInt shouldBe row.getAs[Short]("hi").toInt
    }
  }
}
