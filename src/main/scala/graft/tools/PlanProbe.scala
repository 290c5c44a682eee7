package graft.tools

import org.apache.spark.sql.functions._

/** Prints the physical plans of the r11 collapse paths for the PLANS
  * plan-audit notes (exchanges, broadcasts, generator placement).
  * Usage: PlanProbe [sfDir]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.Sessions.local("graft-planprobe")
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id").as("id"), col("text"))
    val pairs = graft.ops.Dedup.nearDupPairs(docs, "id", "text")
    System.err.println("=== nearDupPairs (post-collapse, checkpointed output) lineage is truncated; showing the CROSS-GROUP expansion plan instead ===")
    val sh = graft.ops.Dedup.shingleHashSet(docs, "id", "text", 3)
    val sigs = graft.ops.Dedup.minhashSigs(sh, 16)
    val cand = graft.ops.Dedup.lshCandidatesFromSigs(sigs, 4, 16)
    cand.explain("formatted")
    System.err.println(s"pairs rows: ${pairs.count()}")
    spark.stop()
  }
}
