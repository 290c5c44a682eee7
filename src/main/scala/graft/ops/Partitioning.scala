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
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
