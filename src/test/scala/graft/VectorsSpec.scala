package graft

import org.apache.spark.sql.functions._
import graft.ops.Vectors

class VectorsSpec extends SparkSpec {

  test("cosine: orthogonal → 0, identical → 1, opposite → -1") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 0.0), Array(0.0, 1.0)),
      (Array(1.0, 2.0), Array(1.0, 2.0)),
      (Array(1.0, 0.0), Array(-1.0, 0.0)))
      .toDF("a", "b")
      .select(Vectors.cosine(col("a"), col("b")).as("c"))
    val out = df.collect().map(_.getDouble(0))
    out(0) shouldBe 0.0 +- 1e-12
    out(1) shouldBe 1.0 +- 1e-12
    out(2) shouldBe -1.0 +- 1e-12
  }

  test("knnBruteForce returns nearest first with deterministic tie-break") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.9, 0.1)), (3L, Array(0.0, 1.0)))
      .toDF("vid", "e")
    val q = Seq(Tuple1(Array(1.0, 0.0))).toDF("e")
    val out = Vectors.knnBruteForce(vecs, q, 2).collect().map(_.getLong(0))
    out.toSeq shouldBe Seq(1L, 2L)
  }

  test("lshBuckets is deterministic and groups identical vectors together") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array.fill(8)(0.5)), (2L, Array.fill(8)(0.5)),
      (3L, Array.tabulate(8)(i => if (i % 2 == 0) 1.0 else -1.0)))
      .toDF("vec_id", "e")
    val b1 = Vectors.lshBuckets(vecs, "e", "vec_id", 4, 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b2 = Vectors.lshBuckets(vecs, "e", "vec_id", 4, 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    b1 shouldBe b2          // no RNG anywhere
    b1(1L) shouldBe b1(2L)  // identical vectors share a bucket
  }
}
