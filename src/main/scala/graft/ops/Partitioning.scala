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
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    // `df.inputFiles` + logical-plan stats read the file listing and
    // size off the analyzed plan — unlike `df.rdd.getNumPartitions`,
    // which forces a SECOND full physical planning of the whole
    // upstream plan (and bypasses AQE) just to read a count.
    //
    // CONTRACT: a non-file-backed frame reports 0 files and is left
    // alone, deliberately. Shuffle-derived partitioning must not be
    // second-guessed, and in-memory inputs are NOT single-partition:
    // LocalTableScanExec parallelizes a LocalRelation to
    // `spark.sql.leafNodeDefaultParallelism` (= defaultParallelism by
    // default) slices, so local test frames already spread without our
    // help (PartitioningSpec asserts this empirically).
    val nFiles = df.inputFiles.length
    if (nFiles == 0) return df
    // Estimate the scan's split count the way the reader sizes splits:
    // total bytes over maxPartitionBytes (file count alone is wrong in
    // both directions — one 10 GB file yields ~80 splits, and hundreds
    // of tiny files get packed into a handful).
    val maxPartitionBytes = org.apache.spark.network.util.JavaUtils
      .byteStringAsBytes(spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    val totalBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val estSplits = (totalBytes / maxPartitionBytes).toLong + 1
    if (estSplits < target) df.repartition(target) else df
  }
}
