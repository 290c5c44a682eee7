package graft

import org.apache.spark.sql.functions._
import graft.ops.Classify

class ClassifySpec extends SparkSpec {

  // Planted corpus: "clean" documents reuse a small fluent vocabulary;
  // "junk" documents are keyboard-mash tokens. Labels follow the plant.
  private def corpus = {
    import spark.implicits._
    val clean = (0 until 20).map(i =>
      (i.toLong, s"the quick brown fox jumps over the lazy dog again and again number$i", true))
    val junk = (100 until 120).map(i =>
      (i.toLong, s"zxqv$i wvutp qqqzz jkljk zzxcv mmnbv qwerty$i asdfgh zxcvbn", false))
    (clean ++ junk).toDF("id", "text", "y")
  }

  test("nbTrain: model is bounded by nFeatures and weights follow the evidence sign") {
    val model = Classify.nbTrain(corpus, "text", col("y"), nFeatures = 64)
    val rows = model.collect()
    rows.length should be <= 64
    // A feature seen only in the positive class weighs positive; only
    // in the negative class, negative.
    rows.foreach { r =>
      val (nPos, nNeg, w) = (r.getLong(1), r.getLong(2), r.getLong(3))
      if (nPos > 0 && nNeg == 0) w should be > 0L
      if (nNeg > 0 && nPos == 0) w should be < 0L
    }
  }

  test("planted junk documents rank below planted clean ones") {
    val model = Classify.nbTrain(corpus, "text", col("y"), nFeatures = 64)
    val scored = Classify.nbScore(corpus, "id", "text", model, nFeatures = 64)
      .withColumn("norm", col("score").cast("double") / col("n_tok"))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("norm")).toMap
    val cleanScores = (0 until 20).map(i => scored(i.toLong))
    val junkScores = (100 until 120).map(i => scored(i.toLong))
    // Full separation on this plant: every junk doc scores below every
    // clean doc — the learned gate the rule family can't express.
    junkScores.max should be < cleanScores.min
  }

  test("nbScore backs off to the zero-count weight for features unseen in training") {
    import spark.implicits._
    val model = Classify.nbTrain(corpus, "text", col("y"), nFeatures = 64)
    // A document of entirely novel tokens still scores (left join +
    // fallback), with every token at the unseen weight.
    val novel = Seq((999L, "hippopotamus gargantuan serendipity")).toDF("id", "text")
    val out = Classify.nbScore(novel, "id", "text", model, nFeatures = 64).collect()
    // Guard against accidental hash collision with a trained feature:
    // only assert when genuinely unseen tokens stayed unseen (n_tok=3).
    out.length shouldBe 1
    out.head.getLong(1) shouldBe 3L
  }

  test("auc: hand-checked wins/ties algebra, perfect and inverted separation") {
    import spark.implicits._
    // pos scores {3, 2}, neg scores {1, 2}: wins = 3 (3>1, 3>2, 2>1),
    // ties = 1 (2 vs 2) → auc = (3 + 0.5)/4 → num 7, den 8, 875000.
    val mixed = Seq((3L, true), (2L, true), (1L, false), (2L, false))
      .toDF("score", "y")
    val r = Classify.auc(mixed, col("score"), col("y")).collect().head
    r.getLong(0) shouldBe 2L
    r.getLong(1) shouldBe 2L
    r.getDecimal(2).longValueExact() shouldBe 7L
    r.getDecimal(3).longValueExact() shouldBe 8L
    r.getLong(4) shouldBe 875000L
    // Perfect separation → exactly 1e6; inverted labels → exactly 0.
    val sep = Seq((10L, true), (9L, true), (2L, false), (1L, false))
      .toDF("score", "y")
    Classify.auc(sep, col("score"), col("y"))
      .collect().head.getLong(4) shouldBe 1000000L
    Classify.auc(sep, col("score"), !col("y"))
      .collect().head.getLong(4) shouldBe 0L
  }

  test("auc: bucketed prefix sum is partitioning-invariant and handles negative scores") {
    import spark.implicits._
    // 200 examples over a signed score range crossing several bucket
    // boundaries; label correlates with score but with noise + ties.
    val rows = (0 until 200).map { i =>
      val score = (i * 37 % 101) - 50L
      (score, (score * 3 + (i % 7)) > 0)
    }
    val df = rows.toDF("score", "y")
    val a = Classify.auc(df, col("score"), col("y"), buckets = 8).collect().head
    val b = Classify.auc(df.repartition(13), col("score"), col("y"), buckets = 3)
      .collect().head
    a.toSeq shouldBe b.toSeq
    // Cross-check wins/ties against the quadratic definition.
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val wins = pos.map(p => neg.count(p > _).toLong).sum
    val ties = pos.map(p => neg.count(p == _).toLong).sum
    a.getDecimal(2).longValueExact() shouldBe (2 * wins + ties)
    a.getDecimal(3).longValueExact() shouldBe (2L * pos.length * neg.length)
  }

  test("calibration: fixed-width bins conserve counts and report exact positive fractions") {
    import spark.implicits._
    // Scores 0..99, label = score ≥ 50: bins 0-4 all-negative, 5-9
    // all-positive; each bin holds exactly 10 examples.
    val df = (0 until 100).map(i => (i.toLong, i >= 50)).toDF("score", "y")
    val bins = Classify.calibration(df, col("score"), col("y"), bins = 10)
      .orderBy("bin").collect()
    bins.length shouldBe 10
    bins.map(_.getLong(1)).sum shouldBe 100L
    for (r <- bins) {
      val (bin, n, nPos, pos1e6) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getAs[Long]("pos1e6"))
      n shouldBe 10L
      nPos shouldBe (if (bin < 5) 0L else 10L)
      pos1e6 shouldBe (if (bin < 5) 0L else 1000000L)
    }
    // Negative-score ranges bin correctly too (the −lo shift).
    val neg = Seq((-30L, false), (-11L, false), (9L, true), (29L, true))
      .toDF("score", "y")
    val nb = Classify.calibration(neg, col("score"), col("y"), bins = 3)
      .orderBy("bin").collect()
    nb.map(_.getLong(0)).toSeq shouldBe Seq(0L, 1L, 2L)
    nb.map(_.getLong(1)).sum shouldBe 4L
  }
}
