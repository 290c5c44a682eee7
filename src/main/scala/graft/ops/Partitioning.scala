package graft.ops

import org.apache.spark.sql.DataFrame

/** Partitioning hygiene for compute-heavy pipelines.
  *
  * A small parquet table arrives as ONE input split, so every downstream
  * narrow transform (explode, md5, dot products) runs on one core until
  * the first shuffle. `spread` fans the input out to the cluster's
  * parallelism — but only when the source is under-partitioned, so a
  * 100 TB table that already has thousands of splits is never shuffled
  * gratuitously.
  */
object Partitioning {
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // `df.inputFiles` reads the file listing off the analyzed plan —
    // unlike `df.rdd.getNumPartitions`, which forces a SECOND full
    // physical planning of the whole upstream plan (and bypasses AQE)
    // just to read a count. A non-file-backed frame reports 0 files and
    // is left alone: its partitioning came from a shuffle we shouldn't
    // second-guess.
    val nFiles = df.inputFiles.length
    if (nFiles > 0 && nFiles < target) df.repartition(target) else df
  }
}
