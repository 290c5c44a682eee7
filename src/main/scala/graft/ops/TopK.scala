package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k-per-group as a mergeable aggregate.
  *
  * The window formulation (`row_number() OVER (PARTITION BY g ORDER BY v
  * DESC) <= k`) shuffles EVERY row of every group and sorts whole
  * partitions before discarding all but k rows — at 100 TB that's the
  * entire fact table through the exchange for a k·|groups| output. This
  * aggregator keeps a k-bounded buffer per group, so the map-side
  * partial aggregation discards losers before the shuffle: the exchange
  * carries at most k rows per (group × input partition), and merge() is
  * a k+k merge. Same result, input-size-independent shuffle.
  *
  * Items order by (value DESC, id ASC); ids must be unique per group
  * for a deterministic result (enforced by the caller's choice of id).
  */
object TopK {

  /** Buffer/result element — (value, tie-break id). */
  private def better(v1: Double, id1: Long, v2: Double, id2: Long): Boolean =
    v1 > v2 || (v1 == v2 && id1 < id2)

  /** Aggregator over (value, id) pairs; buffer is a best-first sorted
    * array of at most k elements (k is small — tens — so linear insert
    * beats heap constant factors and keeps the buffer encodable as two
    * flat arrays).
    */
  class TopKAgg(k: Int) extends Aggregator[(Double, Long), Array[(Double, Long)], Array[(Double, Long)]] {
    def zero: Array[(Double, Long)] = Array.empty

    def reduce(buf: Array[(Double, Long)], in: (Double, Long)): Array[(Double, Long)] = {
      val (v, id) = in
      if (buf.length < k) {
        // insert keeping best-first order
        val out = new Array[(Double, Long)](buf.length + 1)
        var i = 0
        while (i < buf.length && better(buf(i)._1, buf(i)._2, v, id)) { out(i) = buf(i); i += 1 }
        out(i) = in
        while (i < buf.length) { out(i + 1) = buf(i); i += 1 }
        out
      } else if (better(v, id, buf(k - 1)._1, buf(k - 1)._2)) {
        var i = k - 1
        while (i > 0 && better(v, id, buf(i - 1)._1, buf(i - 1)._2)) { buf(i) = buf(i - 1); i -= 1 }
        buf(i) = in
        buf
      } else buf
    }

    def merge(x: Array[(Double, Long)], y: Array[(Double, Long)]): Array[(Double, Long)] = {
      // k+k best-first merge, truncated at k
      val n = math.min(k, x.length + y.length)
      val out = new Array[(Double, Long)](n)
      var (i, j, o) = (0, 0, 0)
      while (o < n) {
        val takeX = j >= y.length ||
          (i < x.length && better(x(i)._1, x(i)._2, y(j)._1, y(j)._2))
        if (takeX) { out(o) = x(i); i += 1 } else { out(o) = y(j); j += 1 }
        o += 1
      }
      out
    }

    def finish(buf: Array[(Double, Long)]): Array[(Double, Long)] = buf
    def bufferEncoder: Encoder[Array[(Double, Long)]] = ExpressionEncoder()
    def outputEncoder: Encoder[Array[(Double, Long)]] = ExpressionEncoder()
  }

  /** Top-k rows per group: one exploded row per winner with `rank`
    * 1..k (value DESC, id ASC). Output columns: groupCol, rank,
    * idName, valueName.
    */
  def topKPerGroup(df: DataFrame, groupCol: String, valueCol: Column, idCol: Column,
                   k: Int, valueName: String, idName: String): DataFrame = {
    val agg = udaf(new TopKAgg(k), ExpressionEncoder[(Double, Long)]())
    df.groupBy(col(groupCol))
      .agg(agg(valueCol.cast("double"), idCol.cast("long")).as("__top"))
      .select(col(groupCol), posexplode(col("__top")))
      .select(col(groupCol), (col("pos") + 1).cast("int").as("rank"),
        col("col._2").as(idName), col("col._1").as(valueName))
  }
}
