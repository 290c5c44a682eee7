package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.functions.{ZOrderImpl, ZOrderKey}
import graft.ops.Store

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave matches a bit-by-bit reference and truncates to 31 bits") {
    def ref(x: Long, y: Long): Long = {
      var r = 0L
      var b = 0
      while (b < 31) {
        r |= ((x >> b) & 1L) << (2 * b)
        r |= ((y >> b) & 1L) << (2 * b + 1)
        b += 1
      }
      r
    }
    val rng = new scala.util.Random(7)
    for (_ <- 0 until 2000) {
      val x = rng.nextLong() & 0x7fffffffL
      val y = rng.nextLong() & 0x7fffffffL
      ZOrderImpl.interleave(x, y) shouldBe ref(x, y)
    }
    // bits above 30 are ignored, never smeared into the key
    ZOrderImpl.interleave(0x7fffffffL | (1L << 40), 5L) shouldBe
      ZOrderImpl.interleave(0x7fffffffL, 5L)
    // corner values
    ZOrderImpl.interleave(0, 0) shouldBe 0L
    ZOrderImpl.interleave(1, 0) shouldBe 1L
    ZOrderImpl.interleave(0, 1) shouldBe 2L
  }

  test("the expression participates in whole-stage codegen") {
    // (a local Seq would constant-fold to a LocalTableScan before any
    // codegen stage exists — range() keeps a real executed plan)
    val df = spark.range(3, 4)
      .select(ZOrderKey.zorderKey($"id", $"id" + 2).as("z"))
    // `*(1)` = inside WholeStageCodegen stage 1; a CodegenFallback
    // expression would strip the star from its Project
    df.queryExecution.executedPlan.toString should include("*(1) Project [zorderkey")
    df.as[Long].head() shouldBe ZOrderImpl.interleave(3L, 5L)
  }

  test("z-ordered layout bounds per-file envelopes in BOTH dimensions") {
    // Uniform independent (a, b): a linear sort on `a` leaves every
    // file spanning b's whole domain; the Z-layout must shrink the
    // per-file b-envelope by ~4x at 16 files (2 bits of each dim).
    val n = 20000
    val dom = 1 << 20
    val rows = (0 until n).map { i =>
      val h = i * 2654435761L
      ((h >>> 3) % dom, (h * 40503L >>> 7) % dom)
    }
    val df = rows.toDF("a", "b")

    def avgEnvelope(path: String): Double = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.toString)
      val widths = files.map { f =>
        val r = spark.read.parquet(f).agg(max($"b") - min($"b")).as[Long].head()
        r.toDouble
      }
      widths.sum / widths.length
    }

    val linear = Files.createTempDirectory("zorder-lin").toString + "/t"
    df.repartitionByRange(16, $"a").sortWithinPartitions($"a")
      .write.parquet(linear)
    val zordered = Files.createTempDirectory("zorder-z").toString + "/t"
    Store.writeZOrdered(df, zordered, "a", "b", files = 16)

    spark.read.parquet(zordered).count() shouldBe n
    val (el, ez) = (avgEnvelope(linear), avgEnvelope(zordered))
    withClue(s"linear=$el zorder=$ez: ") { ez should be < el * 0.5 }
  }
}
