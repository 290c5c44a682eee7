package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Round16Queries
import graft.ops.IvfIndexStore

/** Scratch measurement for the q_st28 maintenance-tick fixture: the
  * imbalance trajectory (per tick) and version sequence across scales,
  * so the gate's policy threshold is MEASURED, not guessed (the
  * PlanProbe posture). Run: `runMain graft.tools.St28Probe <sfDir>...`
  */
object St28Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .appName("st28-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    args.foreach { d =>
      graft.ops.TempFiles.withTempDir("st28probe") { root =>
        val vroot = new java.io.File(root, "live").getAbsolutePath
        val vecs = Round16Queries.st28Vecs(spark, d).localCheckpoint(true)
        val corpus = vecs.filter($"vid" >= 1)
        IvfIndexStore.createLive(spark, vroot, Round16Queries.st28AxisCentroids(spark))
        val ticks = Seq(1L, 2L, 0L).zipWithIndex.map { case (m, i) =>
          val batch = corpus.filter(pmod($"vid", lit(3L)) === m)
          val (v, imb) = IvfIndexStore.maintainedIngest(spark, vroot, batch,
            maxImbalance1e4 = 20000L, kNew = 8, iters = 3)
          s"tick${i + 1}: n=${batch.count()} imb=${imb.getOrElse(-1L)} v=$v"
        }
        println(s"SF $d -> ${ticks.mkString(" | ")}")
      }
    }
    spark.stop()
  }
}
