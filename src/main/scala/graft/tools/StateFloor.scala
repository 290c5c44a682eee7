package graft.tools

/** Experiment main behind the q_st7–q_st9 "state floor" question: the
  * three stream-stream-join gates have cost a flat ~7–8 s each at
  * sf0.1 across rounds. Is that Spark state-store machinery (and which
  * part), and does the RocksDB provider move it?
  *
  * Runs each join gate N times under the default (HDFS-backed) and
  * RocksDB state-store providers on one session, with a
  * StreamingQueryListener dumping the per-microbatch duration map and
  * per-operator state metrics (rows, commit time) to stderr. Findings
  * land in PLANS.md; this main stays as the reproduction.
  */
object StateFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = graft.Sessions.local("graft-statefloor")
    val queries =
      Seq("q_st7_stream_join", "q_st8_stream_outer_join", "q_st9_stream_full_outer")

    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        val st = p.stateOperators.map(s =>
          s"op=${s.operatorName} rows=${s.numRowsTotal} updated=${s.numRowsUpdated} " +
            s"commitMs=${s.commitTimeMs}").mkString(" | ")
        System.err.println(
          s"[floor] batch=${p.batchId} durationMs=${p.durationMs} $st")
      }
    }
    spark.streams.addListener(listener)

    def time(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // warmup: JIT + codegen + parquet footers, outside the comparison
    time(queries.head)

    // (provider, state partitions): state-store instances per stateful
    // operator = shuffle partitions, so the partition count multiplies
    // every per-batch open/load/commit constant — including the no-data
    // watermark-finalize batch that does no join work at all.
    for ((prov, parts) <- Seq(("default", 32), ("rocksdb", 32),
                              ("default", 8), ("default", 4))) {
      if (prov == "rocksdb")
        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      else
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      for (q <- queries) {
        System.err.println(s"[floor] ==== provider=$prov parts=$parts query=$q")
        val ts = (1 to reps).map(_ => time(q))
        println(f"$prov%-8s parts=$parts%-3d $q%-26s min=${ts.min}%6.2f s  " +
          s"runs=${ts.map(t => f"$t%.2f").mkString(",")}")
      }
    }
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.stop()
  }
}
