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
}
