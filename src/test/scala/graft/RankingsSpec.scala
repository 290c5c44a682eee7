package graft

import java.sql.Date
import org.apache.spark.sql.types._
import graft.ops.Rankings

/** Port of the reference's rankings golden suite
  * (tests/test_volume_rankings/test_rankings_generation.py, see
  * FIXTURES.md §4–§6): 5 days × 5 symbols with a fixed volume ladder and
  * ×(1 + 0.01·day) daily growth that preserves relative order.
  */
class RankingsSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val symbols = Seq(
    ("BTCUSDT", 1000000000.0), ("ETHUSDT", 500000000.0), ("SOLUSDT", 100000000.0),
    ("BNBUSDT", 50000000.0), ("ADAUSDT", 10000000.0))
  private val days = (15 to 19).map(d => Date.valueOf(f"2024-01-$d%02d"))

  private lazy val daily = {
    import spark.implicits._
    val rows = for {
      (day, i) <- days.zipWithIndex
      (sym, base) <- symbols
    } yield (day, sym, base * (1 + 0.01 * i), (base / 1000).toLong)
    rows.toDF("date", "symbol", "volume", "trade_count")
  }

  private lazy val out = Rankings.pipeline(daily).cache()

  test("rank order follows the volume ladder on every day (test_rankings_generation.py:247-262)") {
    val byDay = out.select("date", "symbol", "rank").collect()
      .groupBy(_.getDate(0)).view.mapValues(_.sortBy(_.getShort(2)).map(_.getString(1)))
    byDay.values.foreach { syms =>
      syms.toSeq shouldBe Seq("BTCUSDT", "ETHUSDT", "SOLUSDT", "BNBUSDT", "ADAUSDT")
    }
  }

  test("day-1 rank changes are all NULL (test_rankings_generation.py:291-306)") {
    val day1 = out.filter(out("date") === days.head)
      .select("rank_change_1d", "rank_change_7d", "rank_change_14d", "rank_change_30d")
      .collect()
    day1.foreach { r => (0 to 3).foreach(i => assert(r.isNullAt(i))) }
  }

  test("day-2 rank_change_1d is 0 for stable ladder (test_rankings_generation.py:275-289)") {
    out.filter(out("date") === days(1)).select("rank_change_1d").collect()
      .foreach(r => r.getShort(0) shouldBe 0)
  }

  test("percentile extremes: BTC < 25, ADA > 75 (test_rankings_generation.py:308-331)") {
    val btc = out.filter(out("symbol") === "BTCUSDT").select("percentile").collect()
    btc.foreach(_.getFloat(0) should be < 25.0f)
    val ada = out.filter(out("symbol") === "ADAUSDT").select("percentile").collect()
    ada.foreach(_.getFloat(0) should be > 75.0f)
  }

  test("market share sums to ~100 per day (test_rankings_generation.py:334-345)") {
    import org.apache.spark.sql.functions._
    out.groupBy("date").agg(sum("market_share_pct").as("s")).collect()
      .foreach { r => r.getDouble(1) shouldBe 100.0 +- 0.1 }
  }

  test("single symbol: rank 1, percentile 0, share 100 (test_rankings_generation.py:449-471)") {
    import spark.implicits._
    val one = Seq((Date.valueOf("2024-01-15"), "ONLYUSDT", 123456.78, 123L))
      .toDF("date", "symbol", "volume", "trade_count")
    val r = Rankings.pipeline(one).collect().head
    r.getAs[Short]("rank") shouldBe 1
    r.getAs[Float]("percentile") shouldBe 0.0f
    r.getAs[Float]("market_share_pct") shouldBe 100.0f
  }

  test("ties share a dense rank with no gap (test_rankings_generation.py:473-505)") {
    import spark.implicits._
    val tied = Seq(
      (Date.valueOf("2024-01-15"), "SYM1USDT", 1000000.0, 1L),
      (Date.valueOf("2024-01-15"), "SYM2USDT", 1000000.0, 1L),
      (Date.valueOf("2024-01-15"), "SYM3USDT", 500000.0, 1L))
      .toDF("date", "symbol", "volume", "trade_count")
    val ranks = Rankings.pipeline(tied).select("symbol", "rank").collect()
      .map(r => r.getString(0) -> r.getShort(1)).toMap
    ranks("SYM1USDT") shouldBe 1
    ranks("SYM2USDT") shouldBe 1
    ranks("SYM3USDT") shouldBe 2
  }

  test("output schema matches the 13-column signed golden (FIXTURES.md §6)") {
    val expected = Seq(
      "date" -> DateType, "symbol" -> StringType, "rank" -> ShortType,
      "quote_volume_usdt" -> DoubleType, "trade_count" -> LongType,
      "rank_change_1d" -> ShortType, "rank_change_7d" -> ShortType,
      "rank_change_14d" -> ShortType, "rank_change_30d" -> ShortType,
      "percentile" -> FloatType, "market_share_pct" -> FloatType,
      "days_available" -> ByteType)
    out.schema.fields.map(f => f.name -> f.dataType).toSeq shouldBe expected
    // With a batch stamp the 13th reference column appears (µs timestamp).
    val stamped = Rankings.pipeline(daily,
      Some(java.sql.Timestamp.valueOf("2024-01-20 03:00:00")))
    stamped.schema.fields.last.name shouldBe "generation_timestamp"
    stamped.schema.fields.last.dataType shouldBe TimestampType
    stamped.select("generation_timestamp").distinct().count() shouldBe 1
  }

  test("trailing days_available counts observed rows, capped at 30 (generate_volume_rankings.py:114-118)") {
    val btc = out.filter(out("symbol") === "BTCUSDT").orderBy("date")
      .select("days_available").collect().map(_.getByte(0))
    btc.toSeq shouldBe Seq(1, 2, 3, 4, 5)
  }
}
